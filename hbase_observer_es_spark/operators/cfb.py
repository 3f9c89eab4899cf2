"""OLE2 / Compound File Binary (CFB) container walk — from the public
MS-CFB Open Specification, stdlib-only.

A legacy enterprise or crawl dump carries far more ``.doc``/``.xls``/
``.ppt`` than RTF or ODT, and all of them share ONE container: the
compound file (magic ``D0 CF 11 E0 A1 B1 1A E1``) — a miniature FAT
filesystem inside a single payload. This module walks that filesystem:

* header: major version 3 (512-byte sectors) or 4 (4096-byte sectors,
  whose header still occupies one full sector), little-endian only (the
  spec reserves big-endian but no writer ever shipped one — a byte-order
  mark other than ``FFFE`` is rejected loudly as malformed);
* DIFAT → FAT: the first 109 FAT sector locations live in the header,
  the rest chain through DIFAT sectors (last slot = next DIFAT sector);
* sector chains walk the FAT with an explicit visited-set loop guard —
  chain loops, out-of-range sector ids, and chains that end before the
  declared stream size all name their sector and byte offset;
* directory: 128-byte entries in the directory chain, names UTF-16LE;
  the per-storage red-black trees are traversed (left/right/child)
  with a cycle guard to build full ``/``-joined paths — entry ORDER in
  the directory stream is not significant, the tree is;
* mini stream: streams smaller than the cutoff (4096) live in 64-byte
  mini sectors inside the root entry's stream, chained through the
  miniFAT — both layers get the same guards.

Guards per the codec-family rule: every count/offset/id in the header
and directory is attacker data. Sector counts are bounded by the
payload size (a FAT/DIFAT/directory count claiming more sectors than
the file holds refuses immediately — allocation happens AFTER the
bound check, so a forged count cannot balloon memory), stream sizes are
checked against their chain length, and v3 files mask the spec's
quirk that bits 32+ of the 8-byte size field are undefined there.

Consumers: ``doc_text.py`` (the MS-DOC text extraction), ``xls_text.py``
(the BIFF8 + BIFF5/7 workbook extraction), ``ppt_text.py`` (PowerPoint
text incl. fast-save persist-directory resolution, r15), and the
media census (``D0 CF 11 E0`` → family="document" with a subformat from
the stream names).

Reference parity: none — builder-brief document-pipeline surface
(SURVEY §2-D), beside ``office_text.py``/``rtf_text.py``.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

# special FAT entry values (MS-CFB §2.1)
_MAXREGSECT = 0xFFFFFFFA
_DIFSECT = 0xFFFFFFFC
_FATSECT = 0xFFFFFFFD
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF

_MAX_DIR_ENTRIES = 1_000_000  # directory bomb guard (128 MB of entries)


def looks_like_cfb(payload: bytes) -> bool:
    return payload[: len(CFB_MAGIC)] == CFB_MAGIC


@dataclass
class CfbEntry:
    """One directory entry reachable from the root tree."""

    path: str  # "/"-joined storage path, root excluded
    name: str
    type: int  # 1 = storage, 2 = stream, 5 = root
    size: int
    start: int  # starting sector (FAT or miniFAT domain)


class CfbFile:
    """Parsed compound file: ``entries`` in tree order (root first),
    ``read_stream(path)`` returns a stream's exact bytes."""

    def __init__(self, data: bytes, origin: str = "<bytes>"):
        self._data = data
        self._origin = origin
        if not looks_like_cfb(data):
            raise ValueError(
                f"cfb {origin}: not a compound file (magic {data[:8]!r})"
            )
        if len(data) < 512:
            raise ValueError(
                f"cfb {origin}: {len(data)}-byte payload is shorter than "
                "the 512-byte header"
            )
        (major,) = struct.unpack_from("<H", data, 26)
        (order,) = struct.unpack_from("<H", data, 28)
        if order != 0xFFFE:
            raise ValueError(
                f"cfb {origin}: byte-order mark {order:#06x} is not the "
                "little-endian FFFE every real writer emits"
            )
        if major not in (3, 4):
            raise ValueError(
                f"cfb {origin}: major version {major} unknown (3 or 4)"
            )
        (sshift,) = struct.unpack_from("<H", data, 30)
        (mshift,) = struct.unpack_from("<H", data, 32)
        if (major == 3 and sshift != 9) or (major == 4 and sshift != 12):
            raise ValueError(
                f"cfb {origin}: sector shift {sshift} inconsistent with "
                f"major version {major}"
            )
        if mshift != 6:
            raise ValueError(
                f"cfb {origin}: mini sector shift {mshift} (must be 6)"
            )
        self.major = major
        self.sector_size = 1 << sshift
        self.mini_size = 1 << mshift
        (self._n_fat,) = struct.unpack_from("<I", data, 44)
        (self._dir_start,) = struct.unpack_from("<I", data, 48)
        (self._cutoff,) = struct.unpack_from("<I", data, 56)
        (self._minifat_start,) = struct.unpack_from("<I", data, 60)
        (self._n_minifat,) = struct.unpack_from("<I", data, 64)
        (self._difat_start,) = struct.unpack_from("<I", data, 68)
        (self._n_difat,) = struct.unpack_from("<I", data, 72)
        # every sector the payload can actually hold — the bound every
        # header count is checked against BEFORE anything allocates
        # sector i starts at (i+1)*sector_size (MS-CFB §2.1): for v3 the
        # header fills exactly sector -1's 512 bytes; for v4 the header's
        # 512 bytes plus 3584 zero-fill occupy the whole first 4096-byte
        # slot — so "512 + i*sector_size" would be WRONG for v4
        self._n_sectors = max(
            0, (len(data) - self.sector_size) // self.sector_size
        )
        if self._n_fat > self._n_sectors:
            raise ValueError(
                f"cfb {origin}: header claims {self._n_fat} FAT sectors "
                f"but the payload holds only {self._n_sectors} sectors"
            )
        if self._n_difat > self._n_sectors:
            raise ValueError(
                f"cfb {origin}: header claims {self._n_difat} DIFAT "
                f"sectors but the payload holds only {self._n_sectors}"
            )
        self._fat = self._build_fat()
        self.entries = self._read_directory()
        self._by_path = {e.path: e for e in self.entries if e.type == 2}
        self._root = self.entries[0]
        self._minifat = self._build_minifat()
        self._ministream = (
            self._read_chain(self._root.start, self._root.size, "ministream")
            if self._root.size
            else b""
        )

    # ------------------------------------------------------------ sectors

    def _sector(self, sid: int, what: str) -> bytes:
        if sid > _MAXREGSECT or sid >= self._n_sectors:
            raise ValueError(
                f"cfb {self._origin}: {what} names sector {sid:#x}, "
                f"outside the file's {self._n_sectors} sectors"
            )
        off = (sid + 1) * self.sector_size
        return self._data[off : off + self.sector_size]

    def _build_fat(self) -> list:
        data, origin = self._data, self._origin
        fat_sectors = []
        per = self.sector_size // 4
        # 109 header DIFAT slots
        header_difat = struct.unpack_from("<109I", data, 76)
        for sid in header_difat:
            if sid == _FREESECT:
                continue
            fat_sectors.append(sid)
        # chained DIFAT sectors
        sid = self._difat_start
        seen = set()
        while sid != _ENDOFCHAIN and sid != _FREESECT:
            if sid in seen:
                raise ValueError(
                    f"cfb {origin}: DIFAT chain loops at sector {sid}"
                )
            seen.add(sid)
            if len(seen) > self._n_difat:
                raise ValueError(
                    f"cfb {origin}: DIFAT chain longer than the declared "
                    f"{self._n_difat} sectors"
                )
            sec = self._sector(sid, "DIFAT chain")
            slots = struct.unpack(f"<{per}I", sec)
            for s in slots[:-1]:
                if s != _FREESECT:
                    fat_sectors.append(s)
            sid = slots[-1]
        if len(fat_sectors) != self._n_fat:
            raise ValueError(
                f"cfb {origin}: DIFAT names {len(fat_sectors)} FAT "
                f"sectors, header declares {self._n_fat}"
            )
        fat: list = []
        for fsid in fat_sectors:
            fat.extend(
                struct.unpack(f"<{per}I", self._sector(fsid, "FAT sector"))
            )
        return fat

    def _next(self, sid: int, what: str) -> int:
        if sid >= len(self._fat):
            raise ValueError(
                f"cfb {self._origin}: {what} walks sector {sid}, past the "
                f"{len(self._fat)}-entry FAT"
            )
        return self._fat[sid]

    def _read_chain(self, start: int, size: int, what: str) -> bytes:
        """FAT-domain chain → exactly ``size`` bytes (loud otherwise).
        The walk stops once the declared size is covered (like the mini
        chain) so a small-size entry pointing at a file-spanning chain
        costs O(size), not O(file) — and the visited set still bounds
        looped chains at the payload size."""
        out = []
        sid = start
        seen = set()
        while sid != _ENDOFCHAIN and len(out) * self.sector_size < size:
            if sid in seen:
                raise ValueError(
                    f"cfb {self._origin}: {what} chain loops at sector {sid}"
                )
            seen.add(sid)
            out.append(self._sector(sid, what))
            sid = self._next(sid, what)
        blob = b"".join(out)
        if len(blob) < size:
            raise ValueError(
                f"cfb {self._origin}: {what} chain holds {len(blob)} "
                f"bytes, stream declares {size}"
            )
        return blob[:size]

    # ----------------------------------------------------------- miniFAT

    def _build_minifat(self) -> list:
        if self._n_minifat == 0:
            return []
        blob = self._read_chain(
            self._minifat_start,
            self._n_minifat * self.sector_size,
            "miniFAT",
        )
        return list(struct.unpack(f"<{len(blob) // 4}I", blob))

    def _read_mini_chain(self, start: int, size: int, what: str) -> bytes:
        out = []
        sid = start
        seen = set()
        n_mini = len(self._ministream) // self.mini_size
        while sid != _ENDOFCHAIN and len(out) * self.mini_size < size:
            if sid in seen:
                raise ValueError(
                    f"cfb {self._origin}: {what} mini chain loops at "
                    f"mini sector {sid}"
                )
            seen.add(sid)
            if sid >= n_mini or sid >= len(self._minifat):
                raise ValueError(
                    f"cfb {self._origin}: {what} names mini sector {sid}, "
                    f"outside the {n_mini}-sector mini stream"
                )
            off = sid * self.mini_size
            out.append(self._ministream[off : off + self.mini_size])
            sid = self._minifat[sid]
        blob = b"".join(out)
        if len(blob) < size:
            raise ValueError(
                f"cfb {self._origin}: {what} mini chain holds "
                f"{len(blob)} bytes, stream declares {size}"
            )
        return blob[:size]

    # --------------------------------------------------------- directory

    def _read_directory(self) -> list:
        origin = self._origin
        # directory size is not declared in v3 — walk the chain itself
        raw = []
        sid = self._dir_start
        seen = set()
        while sid != _ENDOFCHAIN:
            if sid in seen:
                raise ValueError(
                    f"cfb {origin}: directory chain loops at sector {sid}"
                )
            seen.add(sid)
            raw.append(self._sector(sid, "directory"))
            if len(seen) * (self.sector_size // 128) > _MAX_DIR_ENTRIES:
                raise ValueError(
                    f"cfb {origin}: directory exceeds {_MAX_DIR_ENTRIES} "
                    "entries — refusing (directory bomb)"
                )
            sid = self._next(sid, "directory")
        blob = b"".join(raw)
        n = len(blob) // 128
        if n == 0:
            raise ValueError(f"cfb {origin}: empty directory")

        def entry(i: int):
            e = blob[i * 128 : (i + 1) * 128]
            (name_len,) = struct.unpack_from("<H", e, 64)
            etype = e[66]
            left, right, child = struct.unpack_from("<III", e, 68)
            (start,) = struct.unpack_from("<I", e, 116)
            (size,) = struct.unpack_from("<Q", e, 120)
            if self.major == 3:
                size &= 0xFFFFFFFF  # high dword undefined in v3 (spec)
            if name_len > 64 or name_len % 2:
                raise ValueError(
                    f"cfb {origin}: directory entry {i} name length "
                    f"{name_len} invalid"
                )
            name = e[: max(0, name_len - 2)].decode("utf-16-le")
            return name, etype, left, right, child, start, size

        _NOSTREAM = 0xFFFFFFFF
        entries: list = []
        visited: set = set()
        parsed: dict = {}

        def get(eid: int):
            if eid >= n:
                raise ValueError(
                    f"cfb {origin}: directory id {eid} out of range ({n})"
                )
            if eid not in parsed:
                parsed[eid] = entry(eid)
            return parsed[eid]

        def mark(eid: int) -> None:
            if eid in visited:
                raise ValueError(
                    f"cfb {origin}: directory tree loops at entry {eid}"
                )
            visited.add(eid)

        # ITERATIVE in-order walk of each storage's sibling tree (an
        # explicit stack, not recursion: a degenerate 100k-entry sibling
        # chain is attacker data and must refuse through this module's
        # ValueErrors, never a RecursionError)
        def walk_tree(tree_root: int, prefix: str) -> None:
            stack: list = []
            eid = tree_root
            while stack or eid != _NOSTREAM:
                while eid != _NOSTREAM:
                    mark(eid)
                    stack.append(eid)
                    eid = get(eid)[2]  # left sibling
                eid = stack.pop()
                name, etype, _left, right, child, start, size = get(eid)
                if etype in (1, 2):
                    path = prefix + name
                    entries.append(CfbEntry(path, name, etype, size, start))
                    if etype == 1 and child != _NOSTREAM:
                        subtrees.append((child, path + "/"))
                elif etype != 0:
                    raise ValueError(
                        f"cfb {origin}: directory entry {eid} has object "
                        f"type {etype} (storage/stream/unknown only here)"
                    )
                eid = right

        rname, rtype, _, _, rchild, rstart, rsize = entry(0)
        if rtype != 5:
            raise ValueError(
                f"cfb {origin}: entry 0 is type {rtype}, not the root "
                "storage (5)"
            )
        visited.add(0)
        entries.append(CfbEntry("", rname, 5, rsize, rstart))
        subtrees: list = []
        if rchild != _NOSTREAM:
            subtrees.append((rchild, ""))
        while subtrees:
            root_id, prefix = subtrees.pop()
            walk_tree(root_id, prefix)
        return entries

    # ------------------------------------------------------------ public

    def stream_paths(self) -> list:
        return [e.path for e in self.entries if e.type == 2]

    def read_stream(self, path: str) -> bytes:
        e = self._by_path.get(path)
        if e is None:
            raise ValueError(
                f"cfb {self._origin}: no stream {path!r} (has: "
                f"{sorted(self._by_path)[:8]})"
            )
        if e.size == 0:
            return b""
        if e.size < self._cutoff:
            return self._read_mini_chain(e.start, e.size, path)
        return self._read_chain(e.start, e.size, path)


def parse_cfb(payload: bytes, origin: str = "<bytes>") -> CfbFile:
    return CfbFile(payload, origin)


# --------------------------------------------------------------- writer


def _collate(name: str) -> tuple:
    """MS-CFB directory-name ordering: shorter first, then uppercase —
    both measured in UTF-16 CODE UNITS, not Python code points (a
    non-BMP character is two code units, and uppercase comparison runs
    over the code-unit sequence), so strict external readers doing the
    spec's tree binary-search agree with our ordering (ADVICE r14).
    Uppercasing is PER CODE UNIT (the spec's mapping is a per-character
    table): Python's full case mapping would expand e.g. U+00DF to "SS"
    and change the unit sequence AND length, so a unit whose uppercase
    is not a single BMP unit keeps its own value; surrogate halves pass
    through. The comparison key is the BIG-endian encoding: UTF-16-BE
    byte order IS code-unit lexicographic order, while comparing the
    file's own little-endian bytes would rank by low byte first
    (U+0100 before U+00FF — wrong)."""
    le = name.encode("utf-16-le")
    key = bytearray()
    for i in range(0, len(le), 2):
        u = le[i] | (le[i + 1] << 8)
        if not 0xD800 <= u <= 0xDFFF:
            up = chr(u).upper()
            if len(up) == 1 and ord(up) < 0x10000:
                u = ord(up)
        key += u.to_bytes(2, "big")
    return (len(le) // 2, bytes(key))


def _balanced(ids: list) -> tuple:
    """Sorted entry ids → (root, {id: (left, right)}) balanced BST."""
    links: dict = {}

    def build(lo: int, hi: int) -> int:
        if lo > hi:
            return 0xFFFFFFFF
        mid = (lo + hi) // 2
        links[ids[mid]] = (build(lo, mid - 1), build(mid + 1, hi))
        return ids[mid]

    return build(0, len(ids) - 1), links


def write_cfb(streams: dict, cutoff: int = 4096) -> bytes:
    """Deterministic v3 compound file from ``{path: bytes}`` streams —
    the production writer closing the container round trip
    (``parse_cfb(write_cfb(s))`` recovers ``s`` exactly; pinned by
    test). Paths may be ``/``-separated (r15): intermediate STORAGES
    are created implicitly, and every storage's children form their own
    BALANCED name-collated BST per the spec's ordering rule (the same
    collation the reader's tree walk assumes). Single-DIFAT-header
    files only: more than 109 FAT sectors (≈7 MB) refuses loudly —
    shard the payload upstream (this writer exists for fixtures, demos,
    and small-document export, not bulk archival)."""
    tree: dict = {}  # name -> ("stream", path) | ("storage", dict)
    for path, v in streams.items():
        segs = path.split("/")
        for s in segs:
            if not s or len(s.encode("utf-16-le")) > 62:
                raise ValueError(f"cfb write: entry name {s!r} invalid")
        node = tree
        for s in segs[:-1]:
            cur = node.get(s)
            if cur is None:
                cur = node[s] = ("storage", {})
            elif cur[0] != "storage":
                raise ValueError(
                    f"cfb write: path {path!r} crosses the stream {s!r}"
                )
            node = cur[1]
        if segs[-1] in node:
            raise ValueError(
                f"cfb write: {path!r} collides with an existing entry"
            )
        node[segs[-1]] = ("stream", path)
    ss = 512
    ms = 64

    def pad(b: bytes, unit: int) -> bytes:
        r = len(b) % unit
        return b if r == 0 else b + b"\x00" * (unit - r)

    mini = {n: v for n, v in streams.items() if len(v) < cutoff}
    big = {n: v for n, v in streams.items() if len(v) >= cutoff}

    ministream = b""
    mini_start: dict = {}
    minifat: list = []
    for n in sorted(mini, key=_collate):
        v = mini[n]
        chunks = pad(v, ms)
        nsec = len(chunks) // ms
        mini_start[n] = len(minifat) if nsec else _ENDOFCHAIN
        base = len(minifat)
        for i in range(nsec):
            minifat.append(base + i + 1 if i < nsec - 1 else _ENDOFCHAIN)
        ministream += chunks
    minifat_blob = pad(
        b"".join(struct.pack("<I", x) for x in minifat), ss
    )

    # directory: ids assigned sibling-group-first in collation order so
    # each group's balanced BST gets collation-ordered ids; storages
    # recurse, carrying their child BST root
    entry_specs: list = [None]  # index 0 = Root Entry, filled last

    def build(children: dict) -> int:
        ordered = sorted(children, key=_collate)
        ids = []
        for nm in ordered:
            ids.append(len(entry_specs))
            entry_specs.append(None)
        root, links = _balanced(ids) if ids else (0xFFFFFFFF, {})
        for eid, nm in zip(ids, ordered):
            kind, payload = children[nm]
            left, right = links[eid]
            if kind == "storage":
                child = build(payload)
                entry_specs[eid] = (nm, 1, None, left, right, child)
            else:
                entry_specs[eid] = (nm, 2, payload, left, right, 0xFFFFFFFF)
        return root

    root_child = build(tree)
    n_dir_entries = len(entry_specs)
    n_dir = (n_dir_entries * 128 + ss - 1) // ss
    n_minifat = len(minifat_blob) // ss if minifat else 0
    ministream_blob = pad(ministream, ss)
    n_ministream = len(ministream_blob) // ss if ministream else 0
    big_blobs = {n: pad(big[n], ss) for n in sorted(big, key=_collate)}
    n_big = sum(len(b) // ss for b in big_blobs.values())
    n_data = n_dir + n_minifat + n_ministream + n_big
    per = ss // 4
    n_fat = 0
    while n_fat * per < n_data + n_fat:
        n_fat += 1
    if n_fat > 109:
        raise ValueError(
            f"cfb write: payload needs {n_fat} FAT sectors — over the "
            "109 header-DIFAT cap (~7 MB); shard upstream"
        )

    dir_first = 0
    minifat_first = n_dir if n_minifat else _ENDOFCHAIN
    ministream_first = n_dir + n_minifat if n_ministream else _ENDOFCHAIN
    big_first: dict = {}
    at = n_dir + n_minifat + n_ministream
    for n, b in big_blobs.items():
        big_first[n] = at
        at += len(b) // ss
    fat_first = at

    fat = [_FREESECT] * (n_fat * per)

    def chain(first: int, nsec: int) -> None:
        for i in range(nsec):
            fat[first + i] = first + i + 1 if i < nsec - 1 else _ENDOFCHAIN

    chain(dir_first, n_dir)
    if n_minifat:
        chain(minifat_first, n_minifat)
    if n_ministream:
        chain(ministream_first, n_ministream)
    for n, b in big_blobs.items():
        chain(big_first[n], len(b) // ss)
    for i in range(n_fat):
        fat[fat_first + i] = _FATSECT

    def entry(name, etype, start, size, left, right, child) -> bytes:
        raw = name.encode("utf-16-le")
        e = bytearray(128)
        e[: len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw) + 2)
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, left, right, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    entries = [entry(
        "Root Entry", 5,
        ministream_first if n_ministream else _ENDOFCHAIN,
        len(ministream), 0xFFFFFFFF, 0xFFFFFFFF, root_child,
    )]
    for spec in entry_specs[1:]:
        nm, etype, path, left, right, child = spec
        if etype == 1:  # storage: no stream payload
            entries.append(entry(nm, 1, 0, 0, left, right, child))
        else:
            start = mini_start[path] if path in mini else big_first[path]
            entries.append(
                entry(nm, 2, start, len(streams[path]), left, right, child)
            )
    dir_blob = pad(b"".join(entries), ss)

    h = bytearray(512)
    h[:8] = CFB_MAGIC
    struct.pack_into("<H", h, 24, 0x3E)
    struct.pack_into("<H", h, 26, 3)
    struct.pack_into("<H", h, 28, 0xFFFE)
    struct.pack_into("<H", h, 30, 9)
    struct.pack_into("<H", h, 32, 6)
    struct.pack_into("<I", h, 44, n_fat)
    struct.pack_into("<I", h, 48, dir_first)
    struct.pack_into("<I", h, 56, cutoff)
    struct.pack_into("<I", h, 60, minifat_first)
    struct.pack_into("<I", h, 64, n_minifat)
    struct.pack_into("<I", h, 68, _ENDOFCHAIN)
    struct.pack_into("<I", h, 72, 0)
    for i in range(109):
        struct.pack_into(
            "<I", h, 76 + 4 * i, fat_first + i if i < n_fat else _FREESECT
        )

    fat_blob = b"".join(struct.pack("<I", x) for x in fat)
    body = dir_blob + minifat_blob + ministream_blob
    for b in big_blobs.values():
        body += b
    return bytes(h) + body + fat_blob


def cfb_subformat(cfb: CfbFile) -> str:
    """Classify a compound file by its marker stream, the public
    convention every Office writer follows: ``WordDocument`` → doc,
    ``Workbook``/``Book`` → xls, ``PowerPoint Document`` → ppt,
    ``__properties_version1.0`` → msg (Outlook message, r15),
    ``EncryptionInfo`` + ``EncryptedPackage`` → ooxml-enc (an
    ECMA-376-encrypted .docx/.xlsx/.pptx riding the CFB wrapper, r16);
    anything else is a generic compound file."""
    names = {e.name for e in cfb.entries if e.type == 2}
    if "EncryptionInfo" in names and "EncryptedPackage" in names:
        return "ooxml-enc"
    if "WordDocument" in names:
        return "doc"
    if "Workbook" in names or "Book" in names:
        return "xls"
    if "PowerPoint Document" in names:
        return "ppt"
    # ROOT-level marker only: an embedded Outlook item nested inside a
    # generic container is not extractable as the container's subformat
    # (msg_text.looks_like_msg applies the same root check)
    if any(
        e.type == 2 and e.path == "__properties_version1.0"
        for e in cfb.entries
    ):
        return "msg"
    return "cfb"
