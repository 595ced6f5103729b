"""Minimal LMDB database writer for testing the native read-only parser.

Writes a spec-conformant `data.mdb` (LMDB 0.9 data version 1, 64-bit) from
a {key: value} mapping: two meta pages, leaf/branch B+tree pages packed
top-down with an even-aligned node heap, and overflow-page chains for big
values. Deliberately encodes the on-disk structures independently from the
C++ reader (struct packing spelled out here, pointer arithmetic there) so a
misremembered field offset shows up as a test failure rather than canceling
out.

Only what the read path needs is produced: no free-DB pages, no dupsort,
no LEAF2. `max_leaf_entries` / `max_branch_entries` shrink the fanout to
force multi-level trees with few keys.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional, Tuple

PSIZE = 4096
PAGEHDR = 16
MAGIC = 0xBEEFC0DE
VERSION = 1
P_INVALID = 0xFFFFFFFFFFFFFFFF

P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01

# A leaf node larger than this spills its value to overflow pages (real
# lmdb's nodemax is ~psize/2 minus overhead; any threshold below that is a
# valid database).
BIG_NODE_THRESHOLD = 1500


def _even(n: int) -> int:
    return n + (n & 1)


def _page_hdr(pgno: int, flags: int, lower: int = 0, upper: int = 0,
              ov_pages: Optional[int] = None) -> bytes:
    head = struct.pack("<QHH", pgno, 0, flags)
    if ov_pages is not None:
        return head + struct.pack("<I", ov_pages)
    return head + struct.pack("<HH", lower, upper)


def _pack_nodes(pgno: int, flags: int, nodes: List[bytes]) -> bytes:
    """Assemble a branch/leaf page: ptr array grows up, node heap grows down."""
    n = len(nodes)
    lower = PAGEHDR + 2 * n
    page = bytearray(PSIZE)
    upper = PSIZE
    ptrs = []
    for nd in nodes:
        upper -= _even(len(nd))
        page[upper : upper + len(nd)] = nd
        ptrs.append(upper)
    assert lower <= upper, "page overflow"
    page[:PAGEHDR] = _page_hdr(pgno, flags, lower, upper)
    page[PAGEHDR:lower] = struct.pack(f"<{n}H", *ptrs)
    return bytes(page)


def _leaf_node(key: bytes, vlen: int, payload: bytes, big: bool) -> bytes:
    flags = F_BIGDATA if big else 0
    return (
        struct.pack("<HHHH", vlen & 0xFFFF, (vlen >> 16) & 0xFFFF, flags, len(key))
        + key
        + payload
    )


def _branch_node(key: bytes, child_pgno: int) -> bytes:
    return (
        struct.pack(
            "<HHHH",
            child_pgno & 0xFFFF,
            (child_pgno >> 16) & 0xFFFF,
            (child_pgno >> 32) & 0xFFFF,
            len(key),
        )
        + key
    )


def _db_record(pad: int, flags: int, depth: int, branch: int, leaf: int,
               ovf: int, entries: int, root: int) -> bytes:
    return struct.pack("<IHHQQQQQ", pad, flags, depth, branch, leaf, ovf, entries, root)


def _meta_page(pgno: int, depth: int, branch_pages: int, leaf_pages: int,
               ovf_pages: int, entries: int, root: int, last_pg: int,
               txnid: int) -> bytes:
    meta = (
        struct.pack("<IIQQ", MAGIC, VERSION, 0, 1 << 24)
        + _db_record(PSIZE, 0, 0, 0, 0, 0, 0, P_INVALID)  # free DB; pad = psize
        + _db_record(0, 0, depth, branch_pages, leaf_pages, ovf_pages, entries, root)
        + struct.pack("<QQ", last_pg, txnid)
    )
    page = bytearray(PSIZE)
    page[:PAGEHDR] = _page_hdr(pgno, P_META)
    page[PAGEHDR : PAGEHDR + len(meta)] = meta
    return bytes(page)


def build_lmdb(
    path: str,
    items: Dict[bytes, bytes],
    max_leaf_entries: Optional[int] = None,
    max_branch_entries: Optional[int] = None,
    live_meta_slot: int = 0,
    subdir: bool = True,
) -> str:
    """Write an LMDB database holding `items`; returns the env path.

    `live_meta_slot` selects which meta page (0 or 1) carries the larger
    txnid and the real tree — the other is a valid but stale snapshot of an
    empty database, so a reader picking the wrong meta sees 0 entries.
    With subdir=False, `path` is the data file itself (MDB_NOSUBDIR).
    """
    sorted_items = sorted(items.items())
    next_pgno = 2  # 0 and 1 are the meta pages
    pages: Dict[int, bytes] = {}
    ovf_pages = 0

    # ---- leaves (+ overflow chains) ----
    leaves: List[Tuple[bytes, int]] = []  # (first key, pgno)
    cur_nodes: List[bytes] = []
    cur_first: Optional[bytes] = None
    cur_bytes = 0

    def flush_leaf():
        nonlocal cur_nodes, cur_first, cur_bytes, next_pgno
        if not cur_nodes:
            return
        pgno = next_pgno
        next_pgno += 1
        pages[pgno] = _pack_nodes(pgno, P_LEAF, cur_nodes)
        leaves.append((cur_first, pgno))
        cur_nodes, cur_first, cur_bytes = [], None, 0

    for key, value in sorted_items:
        big = 8 + len(key) + len(value) > BIG_NODE_THRESHOLD
        if big:
            npg = -(-(len(value) + PAGEHDR) // PSIZE)
            ov_pgno = next_pgno
            next_pgno += npg
            ovf_pages += npg
            run = bytearray(npg * PSIZE)
            run[:PAGEHDR] = _page_hdr(ov_pgno, P_OVERFLOW, ov_pages=npg)
            run[PAGEHDR : PAGEHDR + len(value)] = value
            for j in range(npg):
                pages[ov_pgno + j] = bytes(run[j * PSIZE : (j + 1) * PSIZE])
            node = _leaf_node(key, len(value), struct.pack("<Q", ov_pgno), True)
        else:
            node = _leaf_node(key, len(value), value, False)
        size = _even(len(node))
        full = (
            PAGEHDR + 2 * (len(cur_nodes) + 1) + cur_bytes + size > PSIZE
            or (max_leaf_entries and len(cur_nodes) >= max_leaf_entries)
        )
        if full:
            flush_leaf()
        if cur_first is None:
            cur_first = key
        cur_nodes.append(node)
        cur_bytes += size
    flush_leaf()

    # ---- branch levels up to a single root ----
    depth = 1
    branch_pages = 0
    level = leaves
    while len(level) > 1:
        depth += 1
        next_level: List[Tuple[bytes, int]] = []
        bnodes: List[bytes] = []
        bfirst: Optional[bytes] = None
        bbytes = 0

        def flush_branch():
            nonlocal bnodes, bfirst, bbytes, next_pgno, branch_pages
            if not bnodes:
                return
            pgno = next_pgno
            next_pgno += 1
            branch_pages += 1
            pages[pgno] = _pack_nodes(pgno, P_BRANCH, bnodes)
            next_level.append((bfirst, pgno))
            bnodes, bfirst, bbytes = [], None, 0

        for i, (first_key, child) in enumerate(level):
            key = b"" if not bnodes else first_key
            node = _branch_node(key, child)
            size = _even(len(node))
            full = (
                PAGEHDR + 2 * (len(bnodes) + 1) + bbytes + size > PSIZE
                or (max_branch_entries and len(bnodes) >= max_branch_entries)
            )
            if full:
                flush_branch()
                node = _branch_node(b"", child)  # new page's node 0: implicit -inf
                size = _even(len(node))
            if bfirst is None:
                bfirst = first_key
            bnodes.append(node)
            bbytes += size
        flush_branch()
        level = next_level

    root = level[0][1] if level else P_INVALID
    if not sorted_items:
        root, depth = P_INVALID, 0
    last_pg = next_pgno - 1

    live = _meta_page(
        live_meta_slot, depth, branch_pages, len(leaves), ovf_pages,
        len(sorted_items), root, last_pg, txnid=2,
    )
    stale = _meta_page(
        1 - live_meta_slot, 0, 0, 0, 0, 0, P_INVALID, 1, txnid=1
    )
    pages[live_meta_slot] = live
    pages[1 - live_meta_slot] = stale

    if subdir:
        os.makedirs(path, exist_ok=True)
        data_path = os.path.join(path, "data.mdb")
    else:
        data_path = path
    with open(data_path, "wb") as fh:
        for pgno in range(next_pgno):
            fh.write(pages[pgno])
    return path
