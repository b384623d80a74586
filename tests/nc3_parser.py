"""Minimal independent NetCDF-3 ("classic") container parser.

Test fixture only.  This is a from-the-spec reader of the classic file
format (magic ``CDF\\x01``/``\\x02``) used to validate the bytes our
scipy-fallback NetCDF writer produces WITHOUT trusting scipy to read its
own output — the format-conformance check standing in for a real
netCDF4 interop run where the netCDF4 package is unavailable (CI runs
the real-library branch, tests/test_io.py).

Format reference: the NetCDF classic format specification (CDF-1/CDF-2);
layout summary:

    header  = magic numrecs dim_list gatt_list var_list
    data    = fixed-size variable blocks, then record slabs interleaved
              per record in variable order

Only what the IO schema needs is implemented: dims (incl. the unlimited
record dim), variable metadata, and int/float/double payloads.
"""
import struct

import numpy as np

NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
_TYPES = {1: ('b', 1), 2: ('c', 1), 3: ('>i2', 2), 4: ('>i4', 4),
          5: ('>f4', 4), 6: ('>f8', 8)}


class _Cursor:
    def __init__(self, buf):
        self.buf = buf
        self.off = 0

    def i4(self):
        v = struct.unpack_from('>i', self.buf, self.off)[0]
        self.off += 4
        return v

    def i8(self):
        v = struct.unpack_from('>q', self.buf, self.off)[0]
        self.off += 8
        return v

    def name(self):
        n = self.i4()
        s = self.buf[self.off:self.off + n].decode()
        self.off += n + (-n) % 4            # names pad to 4-byte boundary
        return s

    def values(self, nc_type, nelems):
        dt, size = _TYPES[nc_type]
        nbytes = size * nelems
        raw = self.buf[self.off:self.off + nbytes]
        self.off += nbytes + (-nbytes) % 4
        if nc_type == 2:
            return raw.decode()
        return np.frombuffer(raw, dtype=dt, count=nelems)


def parse(path):
    """Parse a classic NetCDF file -> dict with dims, attrs and
    variables (data fully materialized)."""
    buf = open(path, 'rb').read()
    c = _Cursor(buf)
    assert buf[:3] == b'CDF', "not a NetCDF classic file"
    version = buf[3]
    assert version in (1, 2), f"unsupported CDF version {version}"
    c.off = 4
    numrecs = c.i4()

    def tagged_count(expected):
        tag, n = c.i4(), c.i4()
        assert tag in (0, expected) and (tag or n == 0), (tag, n)
        return n

    dims = []
    for _ in range(tagged_count(NC_DIMENSION)):
        dims.append((c.name(), c.i4()))     # size 0 == record dim

    gatts = {}
    for _ in range(tagged_count(NC_ATTRIBUTE)):
        nm = c.name()
        gatts[nm] = c.values(c.i4(), c.i4())

    vars_meta = []
    for _ in range(tagged_count(NC_VARIABLE)):
        nm = c.name()
        dimids = [c.i4() for _ in range(c.i4())]
        atts = {}
        for _ in range(tagged_count(NC_ATTRIBUTE)):
            an = c.name()
            atts[an] = c.values(c.i4(), c.i4())
        nc_type, vsize = c.i4(), c.i4()
        begin = c.i4() if version == 1 else c.i8()
        vars_meta.append(dict(name=nm, dimids=dimids, atts=atts,
                              nc_type=nc_type, vsize=vsize, begin=begin))

    out = dict(numrecs=numrecs, dims=dims, gatts=gatts, variables={})
    recvars = [v for v in vars_meta if v['dimids'] and
               dims[v['dimids'][0]][1] == 0]
    for v in vars_meta:
        dt, size = _TYPES[v['nc_type']]
        shape = [dims[d][1] for d in v['dimids']]
        is_rec = bool(shape) and shape[0] == 0
        if not is_rec:
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            data = np.frombuffer(buf, dtype=dt, count=n,
                                 offset=v['begin']).reshape(shape)
        else:
            slab_shape = shape[1:]
            slab_n = int(np.prod(slab_shape, dtype=np.int64))
            slab_bytes = slab_n * size
            # record slabs of ALL record variables interleave per record;
            # each record's total size is the sum of padded slab sizes —
            # EXCEPT when there is exactly one record variable, which the
            # spec stores contiguously without padding
            if len(recvars) == 1:
                stride = slab_bytes
            else:
                stride = sum(rv['vsize'] for rv in recvars)
            data = np.stack([
                np.frombuffer(buf, dtype=dt, count=slab_n,
                              offset=v['begin'] + r * stride)
                .reshape(slab_shape)
                for r in range(numrecs)]) if numrecs else \
                np.zeros([0] + slab_shape, dtype=dt)
        out['variables'][v['name']] = dict(
            dims=[dims[d][0] for d in v['dimids']],
            atts=v['atts'], data=data)
    return out
