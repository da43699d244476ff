#!/usr/bin/env python3
"""Independent minimal HDF5 reader + chunked writer (stdlib only) used to
cross-validate graft.sources.Hdf5: two clean-room implementations of the
public HDF5 File Format Specification v3.0 (v0 superblock, v1
symbol-table groups, v1 object headers, contiguous AND unfiltered
v1-B-tree chunked float64 LE datasets). Written from the spec text, NOT
from the Scala code — disagreement between the two means one of them
misread the spec.

Usage:
  h5check.py <file.h5> <dataset> [--head N]
      Prints shape, the first N rows (default 5) and column sums.
  h5check.py --write-chunked <out.h5> <dataset> <n> <c> <chunk_rows>
      Writes a rank-2 chunked float64 dataset with value(i, j) =
      i * 1000 + j + 0.5 — the Hdf5Spec fixture generator (r15: the
      Scala reader's chunked path gates against files written HERE, so
      the two implementations stay independent).
  h5check.py --write-gzip <out.h5> <dataset> <n> <c> <chunk_rows> [filters]
      Same values, but chunks go through a FILTER PIPELINE (r16):
      always deflate (zlib level 6); `filters` is a comma list adding
      'shuffle' (byte shuffle before deflate) and/or 'fletcher32'
      (checksum appended after deflate). The Scala reader's filtered
      path gates against files written here.
"""
import struct
import sys
import zlib

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
    following 0x0010 continuations. Continuation messages COUNT toward
    the declared total (spec + the Scala reader agree; r15 ADVICE fix —
    the old exclusion falsely rejected h5py-grown headers)."""
    if buf[addr] != 1:
        fail(f"object header at {addr} is version {buf[addr]}, want 1")
    nmsgs = u16(buf, addr + 2)
    first_len = u32(buf, addr + 8)
    blocks = [(addr + 16, first_len)]
    out = []
    seen = 0
    while seen < nmsgs and blocks:
        ba, blen = blocks.pop(0)
        pos, end = ba, ba + blen
        while seen < nmsgs and pos + 8 <= end:
            tpe, sz = u16(buf, pos), u16(buf, pos + 2)
            body = buf[pos + 8 : pos + 8 + sz]
            pos += 8 + sz
            seen += 1
            if tpe == 0x0010:
                blocks.append((u64(body, 0), u64(body, 8)))
            else:
                out.append((tpe, body))
    if seen != nmsgs:
        fail(f"header at {addr}: declared {nmsgs} messages, found {seen}")
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
    if lay[0] != 3 or lay[1] not in (1, 2):
        fail(f"layout version/class {(lay[0], lay[1])}, want v3 class 1 or 2")
    if lay[1] == 1:
        addr, size = u64(lay, 2), u64(lay, 10)
        print(f"shape=({n}, {c}) layout=contiguous data_addr={addr} data_bytes={size}")
        if n == 0:
            return
        if size != n * c * 8:
            fail(f"layout size {size} != {n}*{c}*8")

        def row_at(i):
            return struct.unpack_from(f"<{c}d", buf, addr + i * c * 8)
    else:
        # v1-B-tree chunked full-width chunks; gzip/shuffle/fletcher32
        # filter pipelines are decoded (r16), anything else fails
        filters = parse_filters(msgs[0x000B]) if 0x000B in msgs else []
        dty = lay[2]
        if dty != rank + 1:
            fail(f"chunk dimensionality {dty} for rank {rank}")
        bt = u64(lay, 3)
        chunk_rows = u32(lay, 11)
        chunk_cols = u32(lay, 15) if rank == 2 else 1
        if u32(lay, 11 + 4 * (dty - 1)) != 8:
            fail("chunk element size != 8")
        if chunk_cols != c:
            fail(f"column-split chunks ({chunk_cols} of {c}) — outside profile")
        key_len = 8 + 8 * dty

        def chunks(addr):
            if buf[addr : addr + 4] != b"TREE":
                fail(f"bad chunk TREE signature at {addr}")
            if buf[addr + 4] != 1:
                fail("non-chunk B-tree in chunk walk")
            level, used = buf[addr + 5], u16(buf, addr + 6)
            out = []
            for i in range(used):
                k = addr + 24 + i * (key_len + 8)
                size, mask, row_off = u32(buf, k), u32(buf, k + 4), u64(buf, k + 8)
                child = u64(buf, k + key_len)
                if level > 0:
                    out += chunks(child)
                else:
                    if mask != 0:
                        fail(f"nonzero filter mask at row {row_off}")
                    if not filters and size != chunk_rows * c * 8:
                        fail(f"chunk at {row_off} stores {size} bytes")
                    out.append((row_off, child, size))
            return out

        cl = sorted(chunks(bt))
        kind = "+".join(FILTER_NAMES.get(f[0], "?") for f in filters) or "raw"
        print(f"shape=({n}, {c}) layout=chunked({chunk_rows},{kind}) chunks={len(cl)}")
        if n == 0:
            return
        for i, (off, _, _) in enumerate(cl):
            if off != i * chunk_rows:
                fail(f"chunk grid hole at index {i} (row {off})")
        raw_bytes = chunk_rows * c * 8
        decoded = {}

        def chunk_data(k):
            if k not in decoded:
                off, addr2, size = cl[k]
                decoded[k] = decode_chunk(buf[addr2 : addr2 + size],
                                          filters, raw_bytes)
            return decoded[k]

        def row_at(i):
            data = chunk_data(i // chunk_rows)
            return struct.unpack_from(f"<{c}d", data,
                                      (i % chunk_rows) * c * 8)

    sums = [0.0] * c
    for i in range(n):
        row = row_at(i)
        for j, v in enumerate(row):
            sums[j] += v
        if i < head:
            print(f"row {i}: {list(row)}")
    print(f"col_sums={sums}")


FILTER_NAMES = {1: "deflate", 2: "shuffle", 3: "fletcher32"}


def parse_filters(body):
    """Filter-pipeline message (0x000B) v1/v2 -> [(id, [client data])],
    in pipeline (write) order. Only deflate/shuffle/fletcher32 pass."""
    ver, nf = body[0], body[1]
    if ver not in (1, 2):
        fail(f"filter pipeline message version {ver}")
    pos = 8 if ver == 1 else 2
    out = []
    for _ in range(nf):
        fid = u16(body, pos)
        pos += 2
        name_len = 0
        if ver == 1 or fid >= 256:
            name_len = u16(body, pos)
            pos += 2
        flags, nvals = u16(body, pos), u16(body, pos + 2)
        pos += 4
        if ver == 1:
            name_len = (name_len + 7) & ~7 if name_len else 0
        pos += name_len
        vals = [u32(body, pos + 4 * i) for i in range(nvals)]
        pos += 4 * nvals
        if ver == 1 and nvals % 2 == 1:
            pos += 4
        if fid not in FILTER_NAMES:
            fail(f"filter id {fid} outside the deflate/shuffle/fletcher32 profile")
        out.append((fid, vals))
    return out


def unshuffle(data, elem):
    n = len(data) // elem
    out = bytearray(len(data))
    for k in range(elem):
        out[k::elem] = data[k * n : (k + 1) * n]
    return bytes(out)


def shuffle_bytes(data, elem):
    n = len(data) // elem
    out = bytearray(len(data))
    for k in range(elem):
        out[k * n : (k + 1) * n] = data[k::elem]
    return bytes(out)


def fletcher32(data):
    """HDF5's fletcher32 (H5checksum.c H5_checksum_fletcher32): 16-bit
    words assembled BIG-endian from the byte stream, sums folded every
    360 words, odd tail byte used as the HIGH byte of a final word."""
    s1, s2 = 0, 0
    ln = len(data) // 2
    i = 0
    while i < ln:
        for _ in range(min(360, ln - i)):
            s1 += (data[2 * i] << 8) | data[2 * i + 1]
            s2 += s1
            i += 1
        s1 = (s1 & 0xFFFF) + (s1 >> 16)
        s2 = (s2 & 0xFFFF) + (s2 >> 16)
    if len(data) % 2:
        s1 += data[-1] << 8
        s2 += s1
    s1 = (s1 & 0xFFFF) + (s1 >> 16)
    s2 = (s2 & 0xFFFF) + (s2 >> 16)
    s1 = (s1 & 0xFFFF) + (s1 >> 16)
    s2 = (s2 & 0xFFFF) + (s2 >> 16)
    return ((s2 & 0xFFFF) << 16) | (s1 & 0xFFFF)


def decode_chunk(data, filters, raw_bytes):
    """Apply filter INVERSES in reverse pipeline order."""
    for fid, vals in reversed(filters):
        if fid == 3:
            if len(data) < 4:
                fail("fletcher32 chunk shorter than its checksum")
            want = u32(data, len(data) - 4)
            data = data[:-4]
            if fletcher32(data) != want:
                fail("fletcher32 checksum mismatch")
        elif fid == 1:
            data = zlib.decompress(data)
        elif fid == 2:
            data = unshuffle(data, vals[0] if vals else 8)
    if len(data) != raw_bytes:
        fail(f"decoded chunk is {len(data)} bytes, want {raw_bytes}")
    return data


def pad8(x):
    return (x + 7) & ~7


def write_chunked(path, dataset, n, c, chunk_rows, filters=()):
    """Write a rank-2 v1-B-tree chunked float64 file — same fixed group
    scaffolding as the Scala writer's byte plan (one spec, independent
    code), but a class-2 layout + a level-0 type-1 chunk B-tree.
    `filters` (r16) is a tuple from ('shuffle', 'deflate', 'fletcher32')
    in PIPELINE order; chunks are transformed accordingly and the
    dataset object header gains a v1 filter-pipeline message."""
    name = dataset.encode()
    nchunks = (n + chunk_rows - 1) // chunk_rows if n else 0
    D = 3  # rank 2 + element-size dim
    key_len = 8 + 8 * D
    chunk_bytes = chunk_rows * c * 8

    # per-filter v1 message fragments: (id, nvals, client data)
    fdefs = {"deflate": (1, [6]), "shuffle": (2, [8]), "fletcher32": (3, [])}
    fl = [fdefs[f] for f in filters]
    filt_body = 8
    for _, vals in fl:
        filt_body += 8 + 4 * len(vals) + (4 if len(vals) % 2 else 0)
    n_msgs = 3 + (1 if fl else 0)
    oh_msgs_size = 3 * (8 + 24) + ((8 + filt_body) if fl else 0)

    # encode every chunk payload first — filtered sizes drive the layout
    def encode(raw):
        data = raw
        for fid, vals in fl:
            if fid == 2:
                data = shuffle_bytes(data, vals[0])
            elif fid == 1:
                data = zlib.compress(data, vals[0])
            elif fid == 3:
                data = data + struct.pack("<I", fletcher32(data))
        return data

    payloads = []
    for k in range(nchunks):
        raw = bytearray(chunk_bytes)
        for r in range(chunk_rows):
            i = k * chunk_rows + r
            if i >= n:
                break
            row = [i * 1000.0 + j + 0.5 for j in range(c)]
            struct.pack_into(f"<{c}d", raw, r * c * 8, *row)
        payloads.append(encode(bytes(raw)))

    superblock, root_oh, heap = 0, 96, 136
    heap_seg_addr = heap + 32
    heap_seg = 8 + pad8(len(name) + 1)
    gbtree = heap_seg_addr + heap_seg
    gbtree_size = 24 + (2 * 16 + 1) * 8 + 2 * 16 * 8
    snod = gbtree + gbtree_size
    snod_size = 8 + 2 * 4 * 40
    dset_oh = snod + snod_size
    dset_oh_size = 16 + oh_msgs_size
    cbtree = pad8(dset_oh + dset_oh_size)
    # level-0 node: header 24 + used*(key+child) + one trailing key
    cbtree_size = 24 + nchunks * (key_len + 8) + key_len
    data = pad8(cbtree + cbtree_size)
    offs = []
    pos = data
    for pl in payloads:
        offs.append(pos)
        pos += len(pl)
    eof = pos

    out = bytearray(eof)

    def put(off, fmt, *vals):
        struct.pack_into(fmt, out, off, *vals)

    out[0:8] = b"\x89HDF\r\n\x1a\n"
    out[13], out[14] = 8, 8
    put(16, "<HH", 4, 16)  # leaf K, internal K
    put(24, "<QQQQ", 0, UNDEF, eof, UNDEF)
    put(56, "<QQII", 0, root_oh, 1, 0)  # root STE, cache type 1
    put(72, "<QQ", gbtree, heap)
    # root object header: one symbol-table message
    put(root_oh, "<BBHIII", 1, 0, 1, 1, 8 + 16, 0)
    put(root_oh + 16, "<HHI", 0x0011, 16, 0)
    put(root_oh + 24, "<QQ", gbtree, heap)
    # local heap
    out[heap : heap + 4] = b"HEAP"
    put(heap + 8, "<QQQ", heap_seg, UNDEF, heap_seg_addr)
    out[heap_seg_addr + 8 : heap_seg_addr + 8 + len(name)] = name
    # group B-tree: one SNOD child
    out[gbtree : gbtree + 4] = b"TREE"
    put(gbtree + 4, "<BBH", 0, 0, 1)
    put(gbtree + 8, "<QQ", UNDEF, UNDEF)
    put(gbtree + 24, "<QQQ", 0, snod, 8)
    # SNOD with the dataset entry
    out[snod : snod + 4] = b"SNOD"
    put(snod + 4, "<BBH", 1, 0, 1)
    put(snod + 8, "<QQII", 8, dset_oh, 0, 0)
    # dataset object header: datatype, dataspace, chunked layout [,filters]
    put(dset_oh, "<BBHIII", 1, 0, n_msgs, 1, oh_msgs_size, 0)
    m = dset_oh + 16
    put(m, "<HHI", 0x0003, 24, 0)
    put(m + 8, "<BBBBIHHBBBBI", 0x11, 0x20, 63, 0, 8, 0, 64, 52, 11, 0, 52, 1023)
    m += 32
    put(m, "<HHI", 0x0001, 24, 0)
    put(m + 8, "<BBB", 1, 2, 0)
    put(m + 16, "<QQ", n, c)
    m += 32
    put(m, "<HHI", 0x0008, 24, 0)
    put(m + 8, "<BBB", 3, 2, D)
    put(m + 11, "<Q", cbtree if nchunks else UNDEF)
    put(m + 19, "<III", chunk_rows, c, 8)
    m += 32
    if fl:
        put(m, "<HHI", 0x000B, filt_body, 0)
        put(m + 8, "<BB", 1, len(fl))  # v1: version, nfilters, 6 reserved
        fp = m + 16
        for fid, vals in fl:
            put(fp, "<HHHH", fid, 0, 0, len(vals))  # no name, flags 0
            fp += 8
            for v in vals:
                put(fp, "<I", v)
                fp += 4
            if len(vals) % 2:
                fp += 4  # odd client-data padding
    # chunk B-tree: single level-0 type-1 node, sizes = STORED bytes
    out[cbtree : cbtree + 4] = b"TREE"
    put(cbtree + 4, "<BBH", 1, 0, nchunks)
    put(cbtree + 8, "<QQ", UNDEF, UNDEF)
    p2 = cbtree + 24
    for k in range(nchunks):
        put(p2, "<II", len(payloads[k]), 0)
        put(p2 + 8, "<QQQ", k * chunk_rows, 0, 0)
        put(p2 + key_len, "<Q", offs[k])
        p2 += key_len + 8
    put(p2, "<II", 0, 0)  # trailing upper-bound key
    put(p2 + 8, "<QQQ", n, c, 0)
    for k in range(nchunks):
        out[offs[k] : offs[k] + len(payloads[k])] = payloads[k]
    open(path, "wb").write(out)
    kind = "+".join(filters) if filters else "raw"
    print(f"wrote {path}: shape=({n}, {c}) chunk_rows={chunk_rows} "
          f"chunks={nchunks} filters={kind}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--write-chunked":
        write_chunked(sys.argv[2], sys.argv[3], int(sys.argv[4]),
                      int(sys.argv[5]), int(sys.argv[6]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--write-gzip":
        extra = sys.argv[7].split(",") if len(sys.argv) > 7 and sys.argv[7] else []
        pipeline = ([f for f in extra if f == "shuffle"] + ["deflate"]
                    + [f for f in extra if f == "fletcher32"])
        write_chunked(sys.argv[2], sys.argv[3], int(sys.argv[4]),
                      int(sys.argv[5]), int(sys.argv[6]), tuple(pipeline))
    else:
        main()