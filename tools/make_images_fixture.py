#!/usr/bin/env python3
"""Dev-only generator for fixtures/images.ndjson (committed output).

Hand-crafts small valid PNGs (signature + IHDR + zlib IDAT + IEND, pure
stdlib) so the image-decode fixture is deterministic and reviewable.
Pixel values are a fixed function of (x, y, channel); regenerate with
`python3 tools/make_images_fixture.py` — the output is byte-identical.

The engine decodes these for real via javax.imageio
(graft.ops.Multimodal.decodeImage); the DuckDB oracle independently
reads width/height from the PNG IHDR header bytes.
"""
import base64
import json
import struct
import sys
import zlib
from pathlib import Path


def png(w: int, h: int, colortype: int) -> bytes:
    """Minimal PNG: 8-bit, no interlace, filter 0 scanlines."""
    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    nch = {0: 1, 2: 3, 6: 4}[colortype]
    raw = b"".join(
        b"\x00" + bytes((x * 7 + y * 13 + c * 31) % 256
                        for x in range(w) for c in range(nch))
        for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND", b""))


ROWS = [
    (1, png(37, 21, 2)),                       # small RGB
    (2, png(1, 1, 0)),                         # 1x1 grayscale edge case
    (3, png(128, 3, 2)),                       # wide short RGB
    (4, png(255, 17, 0)),                      # grayscale
    (5, png(64, 48, 6)),                       # RGBA
    (6, b"this payload is not an image at all"),  # decode-failure row
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
                      / "fixtures" / "images.ndjson")))
