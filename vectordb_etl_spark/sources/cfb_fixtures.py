"""Minimal [MS-CFB] v3 writer — fixture synthesis for the HWP reader.

This is the WRITE side of the compound-file format whose READ side lives in
``sources/hwp.py`` (public spec, not reference code): root + FileHeader +
BodyText/Section0, small streams in the mini-stream, one FAT + one miniFAT
sector. It exists so the binary-HWP extraction tier can be verified by
ROUND-TRIP — tests and the driver's ``hwp_cfb_roundtrip`` query synthesize
containers whose content is arithmetic in ``doc_id`` and assert the real
reader recovers it. Not a production writer (single-FAT-sector, <4096-byte
streams only).
"""

from __future__ import annotations

import struct
import zlib

FREE, ENDCHAIN, FATSECT, NOSTREAM = 0xFFFFFFFF, 0xFFFFFFFE, 0xFFFFFFFD, 0xFFFFFFFF


def _dir_entry(name, etype, left=NOSTREAM, right=NOSTREAM, child=NOSTREAM,
               start=0, size=0):
    raw = name.encode("utf-16-le")
    buf = bytearray(128)
    buf[0 : len(raw)] = raw
    struct.pack_into("<H", buf, 64, len(raw) + 2)
    buf[66] = etype
    buf[67] = 1  # black
    struct.pack_into("<III", buf, 68, left, right, child)
    struct.pack_into("<I", buf, 116, start)
    struct.pack_into("<Q", buf, 120, size)
    return bytes(buf)


def write_min_cfb(streams: dict[str, bytes]) -> bytes:
    """streams: {'FileHeader': ..., 'BodyText/Section0': ...} (all < 4096)."""
    fh = streams["FileHeader"]
    s0 = streams["BodyText/Section0"]

    def mini_pad(b):
        return b + b"\x00" * (-len(b) % 64)

    mini = mini_pad(fh) + mini_pad(s0)
    fh_n, s0_n = len(mini_pad(fh)) // 64, len(mini_pad(s0)) // 64
    minifat = []
    for i in range(fh_n):
        minifat.append(i + 1 if i < fh_n - 1 else ENDCHAIN)
    for i in range(s0_n):
        minifat.append(fh_n + i + 1 if i < s0_n - 1 else ENDCHAIN)
    minifat += [FREE] * (128 - len(minifat))

    mini_sectors = -(-len(mini) // 512)
    # sectors: 0=FAT 1=miniFAT 2=dir 3..=ministream
    fat = [FATSECT, ENDCHAIN, ENDCHAIN]
    for i in range(mini_sectors):
        fat.append(3 + i + 1 if i < mini_sectors - 1 else ENDCHAIN)
    fat += [FREE] * (128 - len(fat))

    dirs = (
        _dir_entry("Root Entry", 5, child=1, start=3, size=len(mini))
        + _dir_entry("FileHeader", 2, right=2, start=0, size=len(fh))
        + _dir_entry("BodyText", 1, child=3)
        + _dir_entry("Section0", 2, start=fh_n, size=len(s0))
    )
    dirs += b"\x00" * (-len(dirs) % 512)

    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x3E)   # minor
    struct.pack_into("<H", header, 26, 3)      # major v3
    struct.pack_into("<H", header, 28, 0xFFFE)
    struct.pack_into("<H", header, 30, 9)      # 512 B sectors
    struct.pack_into("<H", header, 32, 6)      # 64 B mini
    struct.pack_into("<I", header, 44, 1)      # one FAT sector
    struct.pack_into("<I", header, 48, 2)      # dir start
    struct.pack_into("<I", header, 56, 4096)   # mini cutoff
    struct.pack_into("<I", header, 60, 1)      # miniFAT start
    struct.pack_into("<I", header, 64, 1)      # one miniFAT sector
    struct.pack_into("<I", header, 68, ENDCHAIN)  # no DIFAT continuation
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<I", header, 76, 0)      # DIFAT[0] = FAT sector 0
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * i, FREE)

    body = struct.pack("<128I", *fat) + struct.pack("<128I", *minifat) + dirs
    body += mini + b"\x00" * (-len(mini) % 512)
    return bytes(header) + body


def _hwp_section_bytes(paragraphs: list[str], compress=True) -> bytes:
    units = []
    for p in paragraphs:
        units.extend(ord(c) for c in p)
        units.append(0x0D)
    raw = b"".join(struct.pack("<H", u) for u in units)
    if not compress:
        return raw
    c = zlib.compressobj(wbits=-15)
    return c.compress(raw) + c.flush()


def make_hwp(paragraphs: list[str], compress=True) -> bytes:
    return write_min_cfb(
        {
            "FileHeader": b"HWP Document File" + b"\x00" * 239,
            "BodyText/Section0": _hwp_section_bytes(paragraphs, compress),
        }
    )


