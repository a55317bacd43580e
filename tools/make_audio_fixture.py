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


def ext80(rate: int) -> bytes:
    """Sample rate as the 80-bit IEEE 754 extended float AIFF uses:
    biased-16383 exponent u16, then a 64-bit mantissa with an explicit
    leading 1 (both big-endian)."""
    e = rate.bit_length() - 1
    return struct.pack(">H", 16383 + e) + struct.pack(">Q", rate << (63 - e))


def aiff(rate: int, channels: int, bits: int, frames: int) -> bytes:
    """Canonical AIFF: FORM/AIFF, an 18-byte COMM chunk, then SSND
    (offset and block size 0) — all big-endian, signed PCM."""
    block_align = channels * bits // 8
    data = bytearray()
    for i in range(frames):
        for c in range(channels):
            v = (i * 37 + c * 101) % 256 - 128
            if bits == 8:
                data += struct.pack(">b", v)
            else:
                data += struct.pack(">h", v * 256)
    comm = b"COMM" + struct.pack(">IHIH", 18, channels, frames, bits) + ext80(rate)
    ssnd = b"SSND" + struct.pack(">III", 8 + len(data), 0, 0) + bytes(data)
    body = b"AIFF" + comm + ssnd
    return b"FORM" + struct.pack(">I", len(body)) + body


def au(rate: int, channels: int, bits: int, frames: int) -> bytes:
    """Canonical Sun AU: 24-byte big-endian header (.snd magic, data
    offset, data size, encoding 2=8-bit/3=16-bit linear PCM, rate,
    channels), then signed PCM data."""
    data = bytearray()
    for i in range(frames):
        for c in range(channels):
            v = (i * 37 + c * 101) % 256 - 128
            if bits == 8:
                data += struct.pack(">b", v)
            else:
                data += struct.pack(">h", v * 256)
    encoding = 2 if bits == 8 else 3
    hdr = b".snd" + struct.pack(">IIIII", 24, len(data), encoding, rate, channels)
    return hdr + bytes(data)


def wav_pcm16(rate: int, samples) -> bytes:
    """Canonical mono 16-bit PCM WAV around an explicit sample list —
    the fingerprint rows need SHAPED envelopes, not the flat ramp."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                   rate * 2, 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return hdr + data


def melody(n: int, amps, period: int) -> list:
    """Deterministic amplitude-staircase signal: n samples split into
    len(amps) equal blocks, block b a sawtooth of the given period
    scaled by amps[b]. Every value is a multiple of 4 so an exact
    half-gain re-encode stays integral (the audio-phash gain-invariance
    fixture). Kept well inside int16."""
    out = []
    blocks = len(amps)
    for i in range(n):
        b = min(i * blocks // n, blocks - 1)
        saw = (i * 7) % period - period // 2
        out.append(max(-32768, min(32767, amps[b] * saw * 4)))
    return out


# Fingerprint rows (10-12): signal A, an exact half-gain re-encode of
# A (same envelope SHAPE -> near-identical energy-difference hash), and
# signal B with a different envelope (must NOT pair with A).
_A = melody(900, [1, 5, 2, 8, 3, 13, 1, 9, 6], 50)
_B = melody(900, [9, 1, 12, 2, 7, 1, 11, 3, 1], 36)

ROWS = [
    (1, wav(8000, 1, 16, 1600)),    # 0.2 s mono 16-bit
    (2, wav(44100, 2, 16, 441)),    # 10 ms stereo 16-bit
    (3, wav(11025, 1, 8, 500)),     # mono 8-bit
    (4, wav(22050, 2, 8, 123)),     # stereo 8-bit
    (5, b"this payload is not audio"),  # decode-failure row
    (6, aiff(8000, 1, 16, 1600)),   # AIFF mono 16-bit
    (7, aiff(22050, 2, 16, 441)),   # AIFF stereo 16-bit
    (8, au(16000, 1, 16, 800)),     # AU mono 16-bit
    (9, au(8000, 2, 8, 123)),       # AU stereo 8-bit
    (10, wav_pcm16(8000, _A)),                      # signal A
    (11, wav_pcm16(8000, [s // 2 for s in _A])),    # A re-encoded at half gain
    (12, wav_pcm16(8000, _B)),                      # unrelated signal B
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
