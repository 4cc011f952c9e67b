"""Generate the app favicon (image_generation_tpu/app/static/favicon.ico).

The reference ships a static ``assets/favicon.ico`` (loaded by dash's asset
pipeline, /root/reference/app.py serve path).  We generate our own: a 16x16
"handwritten 7" digit motif on the theme color — the demo is an MNIST digit
generator — written as a plain uncompressed BGRA ICO (one BITMAPINFOHEADER
image, the simplest valid ICO layout; no external imaging deps needed).

Usage:  python scripts/make_favicon.py
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

from image_generation_tpu.app import ui_config

SIZE = 16

# 16x16 bitmap of a hand-drawn-ish "7" (1 = foreground stroke)
GLYPH = [
    "................",
    "................",
    "..############..",
    "..############..",
    "..##........##..",
    "............##..",
    "...........##...",
    "..........##....",
    ".........##.....",
    "........##......",
    ".......##.......",
    "......##........",
    "......##........",
    ".....##.........",
    ".....##.........",
    "................",
]


def _hex_rgb(s: str) -> tuple[int, int, int]:
    s = s.lstrip("#")
    return int(s[0:2], 16), int(s[2:4], 16), int(s[4:6], 16)


def favicon_bytes() -> bytes:
    bg = _hex_rgb(ui_config.THEME_COLOR)
    fg = (255, 255, 255)

    # pixel rows, bottom-up, BGRA
    rows = []
    for y in range(SIZE - 1, -1, -1):
        row = bytearray()
        for x in range(SIZE):
            r, g, b = fg if GLYPH[y][x] == "#" else bg
            row += bytes((b, g, r, 255))
        rows.append(bytes(row))
    xor_data = b"".join(rows)
    # AND mask (all opaque); 16px @1bpp = 2 bytes, padded to 4 per row
    and_data = b"\x00\x00\x00\x00" * SIZE

    # BITMAPINFOHEADER: height is DOUBLED (XOR + AND masks)
    bih = struct.pack(
        "<IiiHHIIiiII", 40, SIZE, SIZE * 2, 1, 32, 0,
        len(xor_data) + len(and_data), 0, 0, 0, 0,
    )
    image = bih + xor_data + and_data
    # ICONDIR + one ICONDIRENTRY
    header = struct.pack("<HHH", 0, 1, 1)
    entry = struct.pack(
        "<BBBBHHII", SIZE, SIZE, 0, 0, 1, 32, len(image), 6 + 16
    )
    return header + entry + image


def main() -> None:
    out = (
        Path(__file__).resolve().parents[1]
        / "image_generation_tpu" / "app" / "static" / "favicon.ico"
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(favicon_bytes())
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
