#!/usr/bin/env python3
"""Generate fixtures/bmps.ndjson: deterministic 24-bit uncompressed BMPs
for the image perceptual-hash (dHash) oracle. BMP is the one raster the
DuckDB oracle can replay byte-by-byte (no codec): pixel array offset at
bytes 10-13, width/height at 18-21/22-25 (LE), bottom-up BGR rows padded
to 4 bytes. Rerunning reproduces the identical file."""
import base64, json, struct

def bmp(width, height, rgb):
    stride = (3 * width + 3) // 4 * 4
    data = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = rgb(x, y)
            row += bytes((b, g, r))      # BGR
        row += b"\x00" * (stride - len(row))
        data += row
    off = 14 + 40
    size = off + len(data)
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(data), 2835, 2835, 0, 0)
    return bytes(hdr + dib + data)

def base(x, y):
    return ((x * 7 + y * 13) % 256, (x * 3 + y * 5) % 256, (x * 11 + y * 17) % 256)

# near-dup: base with two dHash-sampled pixels (grid cells (3,2) and
# (5,6) -> pixels (14,10) and (22,26) for 36x32) blackened -- luma 0
# flips both adjacent gradient comparisons of each touched cell
# (hamming 4 of 64), inside the hamming<=7 pigeonhole guarantee.
def neardup(x, y):
    if (x, y) in ((14, 10), (22, 26)):
        return (0, 0, 0)
    return base(x, y)

def distinct(x, y):
    return ((x * x + y * 3) % 256, (x + y * y) % 256, (x * 5 ^ y * 9) % 256)

rows = [
    (1, bmp(36, 32, base)),
    (2, bmp(36, 32, neardup)),
    (3, bmp(36, 32, distinct)),
    (4, bmp(36, 32, base)),            # exact duplicate of id 1
    (5, bmp(9, 8, base)),              # grid-native size: NN sample = identity
    (6, b"not an image payload: quarantine row"),
]
with open("/root/repo/fixtures/bmps.ndjson", "w") as f:
    for i, payload in rows:
        f.write(json.dumps({"id": i, "b64": base64.b64encode(payload).decode()}) + "\n")
print("wrote", len(rows), "rows")
