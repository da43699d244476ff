#!/usr/bin/env python3
"""Independent minimal HDF5 reader (stdlib only) used to cross-validate
graft.sources.Hdf5's writer: two clean-room implementations of the public
HDF5 File Format Specification v3.0 (v0 superblock, v1 symbol-table
groups, v1 object headers, contiguous float64 LE datasets). Written from
the spec text, NOT from the Scala code — disagreement between the two
means one of them misread the spec.

Usage: h5check.py <file.h5> <dataset> [--head N]
Prints: shape, then the first N rows (default 5) and column sums.
"""
import struct
import sys

UNDEF = 0xFFFFFFFFFFFFFFFF


def fail(msg):
    raise SystemExit(f"h5check: {msg}")


def u16(b, o):
    return struct.unpack_from("<H", b, o)[0]


def u32(b, o):
    return struct.unpack_from("<I", b, o)[0]


def u64(b, o):
    return struct.unpack_from("<Q", b, o)[0]


def messages(buf, addr):
    """All (type, body) messages of the v1 object header at addr,
    following 0x0010 continuations."""
    if buf[addr] != 1:
        fail(f"object header at {addr} is version {buf[addr]}, want 1")
    nmsgs = u16(buf, addr + 2)
    first_len = u32(buf, addr + 8)
    blocks = [(addr + 16, first_len)]
    out = []
    while len(out) < nmsgs and blocks:
        ba, blen = blocks.pop(0)
        pos, end = ba, ba + blen
        while len(out) < nmsgs and pos + 8 <= end:
            tpe, sz = u16(buf, pos), u16(buf, pos + 2)
            body = buf[pos + 8 : pos + 8 + sz]
            pos += 8 + sz
            if tpe == 0x0010:
                blocks.append((u64(body, 0), u64(body, 8)))
            else:
                out.append((tpe, body))
    if len(out) != nmsgs:
        fail(f"header at {addr}: declared {nmsgs} messages, found {len(out)}")
    return out


def main():
    path, dataset = sys.argv[1], sys.argv[2]
    head = int(sys.argv[4]) if len(sys.argv) > 4 and sys.argv[3] == "--head" else 5
    buf = open(path, "rb").read()
    if buf[:8] != b"\x89HDF\r\n\x1a\n":
        fail("bad signature")
    if buf[8] != 0:
        fail(f"superblock version {buf[8]}, want 0")
    if buf[13] != 8 or buf[14] != 8:
        fail("offset/length sizes != 8")
    if u64(buf, 24) != 0:
        fail("nonzero base address")
    eof = u64(buf, 40)
    if eof != len(buf):
        fail(f"EOF address {eof} != file size {len(buf)}")
    # root symbol-table entry at 56: link name offset(8), then OH address
    root_oh = u64(buf, 64)
    symtab = dict(messages(buf, root_oh)).get(0x0011)
    if symtab is None:
        fail("root group has no symbol-table message")
    btree, heap = u64(symtab, 0), u64(symtab, 8)
    if buf[heap : heap + 4] != b"HEAP":
        fail("bad heap signature")
    heap_seg = u64(buf, heap + 24)

    def name_at(off):
        end = buf.index(b"\x00", heap_seg + off)
        return buf[heap_seg + off : end].decode()

    def snods(addr):
        if buf[addr : addr + 4] != b"TREE":
            fail(f"bad TREE signature at {addr}")
        if buf[addr + 4] != 0:
            fail("non-group B-tree")
        level, used = buf[addr + 5], u16(buf, addr + 6)
        kids = [u64(buf, addr + 24 + (2 * i + 1) * 8) for i in range(used)]
        if level == 0:
            return kids
        return [s for k in kids for s in snods(k)]

    entries = []
    for sa in snods(btree):
        if buf[sa : sa + 4] != b"SNOD":
            fail(f"bad SNOD signature at {sa}")
        for i in range(u16(buf, sa + 6)):
            e = sa + 8 + i * 40
            entries.append((name_at(u64(buf, e)), u64(buf, e + 8)))
    oh = dict(entries).get(dataset)
    if oh is None:
        fail(f"no dataset '{dataset}' (links: {[n for n, _ in entries]})")

    msgs = dict(messages(buf, oh))
    dt = msgs[0x0003]
    if dt[0] & 0x0F != 1 or dt[1] & 1 != 0 or u32(dt, 4) != 8:
        fail("datatype is not little-endian float64")
    # the float property block must describe IEEE binary64
    boff, bprec = u16(dt, 8), u16(dt, 10)
    eloc, esz, mloc, msz = dt[12], dt[13], dt[14], dt[15]
    ebias = u32(dt, 16)
    if (boff, bprec, eloc, esz, mloc, msz, ebias) != (0, 64, 52, 11, 0, 52, 1023):
        fail(f"float properties not IEEE binary64: "
             f"{(boff, bprec, eloc, esz, mloc, msz, ebias)}")
    ds = msgs[0x0001]
    rank = ds[1]
    dims_off = 8 if ds[0] == 1 else 4
    n = u64(ds, dims_off)
    c = u64(ds, dims_off + 8) if rank == 2 else 1
    lay = msgs[0x0008]
    if lay[0] != 3 or lay[1] != 1:
        fail(f"layout version/class {(lay[0], lay[1])}, want (3, 1) contiguous")
    addr, size = u64(lay, 2), u64(lay, 10)
    print(f"shape=({n}, {c}) data_addr={addr} data_bytes={size}")
    if n == 0:
        return
    if size != n * c * 8:
        fail(f"layout size {size} != {n}*{c}*8")
    sums = [0.0] * c
    for i in range(n):
        row = struct.unpack_from(f"<{c}d", buf, addr + i * c * 8)
        for j, v in enumerate(row):
            sums[j] += v
        if i < head:
            print(f"row {i}: {list(row)}")
    print(f"col_sums={sums}")


if __name__ == "__main__":
    main()
