#!/usr/bin/env python3
"""Dev-only generator for fixtures/audio.ndjson (committed output).

Hand-crafts canonical PCM WAV files (RIFF + fmt + data chunks, pure
stdlib) so the audio-decode fixture is deterministic and reviewable.
Sample values are a fixed function of the frame index; regenerate with
`python3 tools/make_audio_fixture.py` — the output is byte-identical.

The engine decodes these for real via javax.sound.sampled
(graft.ops.Multimodal.decodeAudio); the DuckDB oracle independently
reads rate/channels/bits/frames from the RIFF header bytes.
"""
import base64
import json
import struct
import sys
from pathlib import Path


def wav(rate: int, channels: int, bits: int, frames: int) -> bytes:
    """Canonical 44-byte-header PCM WAV (no extra chunks)."""
    block_align = channels * bits // 8
    data = bytearray()
    for i in range(frames):
        for c in range(channels):
            v = (i * 37 + c * 101) % 256
            if bits == 8:
                data.append(v)                      # unsigned
            else:
                data += struct.pack("<h", (v - 128) * 256)  # signed 16-bit
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                   rate * block_align, block_align, bits)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + bytes(data)


ROWS = [
    (1, wav(8000, 1, 16, 1600)),    # 0.2 s mono 16-bit
    (2, wav(44100, 2, 16, 441)),    # 10 ms stereo 16-bit
    (3, wav(11025, 1, 8, 500)),     # mono 8-bit
    (4, wav(22050, 2, 8, 123)),     # stereo 8-bit
    (5, b"this payload is not audio"),  # decode-failure row
]


def main(out: str) -> int:
    with open(out, "w") as f:
        for rid, payload in ROWS:
            f.write(json.dumps(
                {"id": rid,
                 "b64": base64.b64encode(payload).decode()}) + "\n")
    print(f"wrote {len(ROWS)} rows to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else
                  str(Path(__file__).resolve().parent.parent
                      / "fixtures" / "audio.ndjson")))
