"""[MS-CFB] v3 writer — fixture synthesis for the HWP reader.

This is the WRITE side of the compound-file format whose READ side lives in
``sources/hwp.py`` (public spec, not reference code). It exists so the
binary-HWP extraction tier can be verified by ROUND-TRIP — tests and the
driver's ``hwp_cfb_roundtrip`` query synthesize containers whose content is
arithmetic in ``doc_id`` and assert the real reader recovers it.

``write_cfb`` is general within v3: arbitrary stream paths with nested
storages (``A/B/C``), streams on either side of the 4096-byte mini cutoff
(mini-stream chains below, FAT chains at-or-above), multi-sector FAT /
miniFAT / directory. ``write_min_cfb`` is the original two-stream facade,
kept for the existing fixtures. Still not a production writer — no DIFAT
continuation (≤109 FAT sectors ≈ 27 MB total), no red-black balancing
(siblings chain through ``right``, which every conforming reader walks).
"""

from __future__ import annotations

import struct
import zlib

FREE, ENDCHAIN, FATSECT, NOSTREAM = 0xFFFFFFFF, 0xFFFFFFFE, 0xFFFFFFFD, 0xFFFFFFFF
_SEC, _MINI, _CUTOFF = 512, 64, 4096


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


def write_cfb(streams: dict[str, bytes]) -> bytes:
    """General v3 writer: ``{'path': bytes, 'Storage/Sub/Stream': bytes}``.

    Streams < 4096 B go to the mini-stream (miniFAT chains); larger ones get
    regular FAT chains. Storages are created implicitly from path prefixes.
    """
    # ---- directory tree from paths ----------------------------------------
    tree: dict = {}
    for path, data in streams.items():
        node = tree
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {"__kids__": {}})["__kids__"]
        node[parts[-1]] = {"__data__": data}

    # flatten to directory entries, DFS; entry 0 = Root
    entries: list[dict] = [
        {"name": "Root Entry", "type": 5, "left": NOSTREAM,
         "right": NOSTREAM, "child": NOSTREAM, "start": 0, "size": 0}
    ]

    def alloc(node: dict, name: str) -> int:
        idx = len(entries)
        if "__data__" in node:
            entries.append(
                {"name": name, "type": 2, "left": NOSTREAM,
                 "right": NOSTREAM, "child": NOSTREAM,
                 "data": node["__data__"], "start": 0,
                 "size": len(node["__data__"])}
            )
        else:
            entries.append(
                {"name": name, "type": 1, "left": NOSTREAM,
                 "right": NOSTREAM, "child": NOSTREAM, "start": 0, "size": 0}
            )
            entries[idx]["child"] = chain_children(node["__kids__"])
        return idx

    def chain_children(kids: dict) -> int:
        first = NOSTREAM
        prev = None
        for name in kids:  # insertion order; siblings via `right`
            idx = alloc(kids[name], name)
            if prev is None:
                first = idx
            else:
                entries[prev]["right"] = idx
            prev = idx
        return first

    entries[0]["child"] = chain_children(tree)

    # ---- mini-stream + regular-stream payloads -----------------------------
    def pad(b: bytes, n: int) -> bytes:
        return b + b"\x00" * (-len(b) % n)

    mini_parts: list[bytes] = []
    minifat: list[int] = []
    regular: list[dict] = []  # entries needing FAT chains, in order
    for e in entries:
        if e["type"] != 2:
            continue
        data = e.pop("data")
        if len(data) < _CUTOFF:
            start = len(minifat)
            n = max(1, -(-len(data) // _MINI)) if data else 0
            if n == 0:  # zero-length stream: no chain
                e["start"], e["size"] = ENDCHAIN, 0
                continue
            mini_parts.append(pad(data, _MINI))
            minifat.extend(
                [start + i + 1 for i in range(n - 1)] + [ENDCHAIN]
            )
            e["start"], e["size"] = start, len(data)
        else:
            regular.append({"entry": e, "data": pad(data, _SEC),
                            "size": len(data)})

    ministream = pad(b"".join(mini_parts), _SEC)
    entries[0]["size"] = sum(len(p) for p in mini_parts)
    minifat_sectors = -(-len(minifat) // 128) if minifat else 0
    minifat += [FREE] * (minifat_sectors * 128 - len(minifat))

    dir_raw = b"".join(
        _dir_entry(e["name"], e["type"], e["left"], e["right"], e["child"],
                   e["start"], e["size"])
        for e in entries
    )
    dir_raw = pad(dir_raw, _SEC)
    dir_sectors = len(dir_raw) // _SEC
    mini_sectors = len(ministream) // _SEC
    reg_sectors = sum(len(r["data"]) // _SEC for r in regular)

    # ---- sector layout: [FAT][miniFAT][dir][ministream][regular...] --------
    # total sectors T = F + rest; F = ceil(T / 128) → fixed point
    rest = minifat_sectors + dir_sectors + mini_sectors + reg_sectors
    fat_sectors = 1
    while -(-(fat_sectors + rest) // 128) != fat_sectors:
        fat_sectors = -(-(fat_sectors + rest) // 128)
    if fat_sectors > 109:
        raise ValueError("fixture writer supports ≤109 FAT sectors")

    first_minifat = fat_sectors
    first_dir = first_minifat + minifat_sectors
    first_mini = first_dir + dir_sectors
    first_reg = first_mini + mini_sectors

    fat = [FATSECT] * fat_sectors
    fat += _chain_run(first_minifat, minifat_sectors)
    fat += _chain_run(first_dir, dir_sectors)
    fat += _chain_run(first_mini, mini_sectors)
    pos = first_reg
    for r in regular:
        n = len(r["data"]) // _SEC
        r["entry"]["start"] = pos
        fat += _chain_run(pos, n)
        pos += n
    fat += [FREE] * (fat_sectors * 128 - len(fat))

    entries[0]["start"] = first_mini if mini_sectors else ENDCHAIN
    # regular starts / root start were assigned after dir_raw was built — redo
    dir_raw = b"".join(
        _dir_entry(e["name"], e["type"], e["left"], e["right"], e["child"],
                   e["start"], e["size"])
        for e in entries
    )
    dir_raw = pad(dir_raw, _SEC)

    header = bytearray(_SEC)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x3E)
    struct.pack_into("<H", header, 26, 3)
    struct.pack_into("<H", header, 28, 0xFFFE)
    struct.pack_into("<H", header, 30, 9)
    struct.pack_into("<H", header, 32, 6)
    struct.pack_into("<I", header, 44, fat_sectors)
    struct.pack_into("<I", header, 48, first_dir)
    struct.pack_into("<I", header, 56, _CUTOFF)
    struct.pack_into("<I", header, 60,
                     first_minifat if minifat_sectors else ENDCHAIN)
    struct.pack_into("<I", header, 64, minifat_sectors)
    struct.pack_into("<I", header, 68, ENDCHAIN)
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into(
            "<I", header, 76 + 4 * i,
            i if i < fat_sectors else FREE,
        )

    body = struct.pack(f"<{fat_sectors * 128}I", *fat)
    if minifat_sectors:
        body += struct.pack(f"<{minifat_sectors * 128}I", *minifat)
    body += dir_raw + ministream
    for r in regular:
        body += r["data"]
    return bytes(header) + body


def _chain_run(start: int, n: int) -> list[int]:
    return [start + i + 1 for i in range(n - 1)] + ([ENDCHAIN] if n else [])


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


def property_set_bytes(props: dict[int, str]) -> bytes:
    """Minimal MS-OLEPS property-set stream: one section, VT_LPWSTR values
    — the WRITE side of ``hwp.parse_ole_property_set`` for round-trip
    fixtures of the \\x05HwpSummaryInformation metadata (title=2,
    subject=3, author=4, keywords=5)."""
    items = sorted(props.items())
    # section: size(4) + count(4) + count*(pid 4, off 4) + packed values
    head = 8 + 8 * len(items)
    vals, offs = [], []
    pos = head
    for _, s in items:
        u = (s + "\x00").encode("utf-16-le")
        v = struct.pack("<II", 31, len(u) // 2) + u  # VT_LPWSTR
        v += b"\x00" * (-len(v) % 4)
        offs.append(pos)
        vals.append(v)
        pos += len(v)
    section = struct.pack("<II", pos, len(items))
    for (pid, _), off in zip(items, offs):
        section += struct.pack("<II", pid, off)
    section += b"".join(vals)
    # header: byte-order, version, sysid, clsid, 1 set; fmtid+offset
    header = struct.pack("<HHI16sI", 0xFFFE, 0, 0x020A0002, b"\x00" * 16, 1)
    header += b"\x11" * 16 + struct.pack("<I", 48)
    return header + section


def make_hwp(
    paragraphs: list[str],
    compress=True,
    title: str | None = None,
    author: str | None = None,
    subject: str | None = None,
    keywords: str | None = None,
) -> bytes:
    streams = {
        "FileHeader": b"HWP Document File" + b"\x00" * 239,
        "BodyText/Section0": _hwp_section_bytes(paragraphs, compress),
    }
    meta = {
        2: title, 3: subject, 4: author, 5: keywords,
    }
    meta = {k: v for k, v in meta.items() if v is not None}
    if meta:
        # the minimal two-stream writer is hardcoded; the general writer
        # takes arbitrary stream paths
        streams["\x05HwpSummaryInformation"] = property_set_bytes(meta)
        return write_cfb(streams)
    return write_min_cfb(streams)


