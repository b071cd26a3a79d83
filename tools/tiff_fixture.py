#!/usr/bin/env python3
"""Independent TIFF decode → committed oracle fixtures for the TIFF gate.

Deliberately shares NO code or design with the Scala reader: tags are
read with struct, LZW is a from-scratch decoder, and the flattened
expectation is assembled directly — so a bug in the Scala reader cannot
leak into its own oracle.

Usage: python3 tools/tiff_fixture.py
Writes  src/test/resources/fixtures/tiff_lzw/part.parquet   (full grid)
        src/test/resources/fixtures/tiff_test/part.parquet  (y < 40 slice)
"""
import struct, os
import pyarrow as pa
import pyarrow.parquet as pq

REF = "/root/reference/beacon-db/beacon-file-formats/beacon-arrow-tiff/test-files"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "fixtures")


def read_tags(d):
    bo = "<" if d[:2] == b"II" else ">"
    off = struct.unpack(bo + "I", d[4:8])[0]
    n = struct.unpack(bo + "H", d[off:off + 2])[0]
    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}
    tags = {}
    for i in range(n):
        e = d[off + 2 + i * 12: off + 14 + i * 12]
        tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
        sz = sizes.get(typ, 1) * cnt
        raw = e[8:8 + sz] if sz <= 4 else d[struct.unpack(bo + "I", e[8:12])[0]:][:sz]
        if typ == 2:
            tags[tag] = raw.split(b"\0")[0].decode("ascii")
        elif typ in (3, 4, 12, 11):
            fmt = {3: "H", 4: "I", 12: "d", 11: "f"}[typ]
            tags[tag] = list(struct.unpack(bo + fmt * cnt, raw))
        else:
            tags[tag] = raw
    return bo, tags


def lzw(data):
    """from-scratch TIFF LZW (MSB codes, early change)"""
    out = bytearray()
    dict_ = {i: bytes([i]) for i in range(256)}
    next_code, width = 258, 9
    bitpos, total = 0, len(data) * 8
    prev = None

    def code():
        nonlocal bitpos
        if bitpos + width > total:
            return 257
        v = 0
        for _ in range(width):
            v = (v << 1) | ((data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        return v

    while True:
        c = code()
        if c == 257:
            return bytes(out)
        if c == 256:
            dict_ = {i: bytes([i]) for i in range(256)}
            next_code, width, prev = 258, 9, None
            continue
        if c in dict_:
            entry = dict_[c]
        elif c == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad LZW code {c}")
        out += entry
        if prev is not None and next_code < 4096:
            dict_[next_code] = prev + entry[:1]
            next_code += 1
            if next_code in (511, 1023, 2047):
                width += 1
        prev = entry


def decode(path):
    d = open(path, "rb").read()
    bo, tags = read_tags(d)
    w, h = tags[256][0], tags[257][0]
    comp = tags[259][0]
    rps = tags.get(278, [h])[0]
    offs, cnts = tags[273], tags[279]
    vals = []
    for s, (o, c) in enumerate(zip(offs, cnts)):
        raw = d[o:o + c]
        if comp == 5:
            raw = lzw(raw)
        rows = min(rps, h - s * rps)
        vals += list(struct.unpack(bo + "f" * (rows * w), raw[: rows * w * 4]))
    nodata = float(tags[42113]) if 42113 in tags else None
    # geo axes: tiepoint+scale, else rectilinear transformation matrix
    if 33922 in tags and 33550 in tags:
        tp, ps = tags[33922], tags[33550]
        lon = [tp[3] + (x - tp[0]) * ps[0] for x in range(w)]
        lat = [tp[4] - (y - tp[1]) * ps[1] for y in range(h)]
    else:
        m = tags[34264]
        assert m[1] == 0.0 and m[4] == 0.0
        lon = [m[0] * x + m[3] for x in range(w)]
        lat = [m[5] * y + m[7] for y in range(h)]
    band = [None if nodata is not None and v == nodata else v for v in vals]
    return w, h, band, lon, lat


def write(path, w, h, band, lon, lat, ymax=None):
    ys, xs, lats, lons, vs = [], [], [], [], []
    for y in range(h if ymax is None else min(h, ymax)):
        for x in range(w):
            ys.append(y)
            xs.append(x)
            lats.append(lat[y])
            lons.append(lon[x])
            vs.append(band[y * w + x])
    t = pa.table({
        "y": pa.array(ys, pa.int32()), "x": pa.array(xs, pa.int32()),
        "lat": pa.array(lats, pa.float64()), "lon": pa.array(lons, pa.float64()),
        "band0": pa.array(vs, pa.float64())})
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(t, path)
    print(path, t.num_rows, "rows,", sum(v is None for v in vs), "nulls")


w, h, band, lon, lat = decode(f"{REF}/synthetic_lzw_stripped_f32.tif")
write(f"{OUT}/tiff_lzw/part.parquet", w, h, band, lon, lat)

w, h, band, lon, lat = decode(f"{REF}/test.tif")
write(f"{OUT}/tiff_test/part.parquet", w, h, band, lon, lat, ymax=40)
