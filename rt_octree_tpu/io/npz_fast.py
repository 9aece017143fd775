"""Fast .npz reading.

numpy's np.load(npz) streams every entry through ZipExtFile (small
chunked reads + CRC), which costs minutes on multi-100MB octrees.  This reader
parses the zip central directory, bulk-reads each member, decompresses
with one zlib call, and builds arrays with np.frombuffer -- same result,
~10x faster.  (This is the loading role cnpy plays for the reference.)
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def load_npz_fast(path: str) -> dict[str, np.ndarray]:
    import zipfile

    out = {}
    with open(path, "rb") as f:
        zf = zipfile.ZipFile(f)
        for info in zf.infolist():
            name = info.filename
            if not name.endswith(".npy"):
                continue
            # locate the raw member data: local header is 30 bytes +
            # name + extra
            f.seek(info.header_offset)
            lh = f.read(30)
            if lh[:4] != b"PK\x03\x04":
                raise ValueError(f"bad local header for {name}")
            name_len, extra_len = struct.unpack("<HH", lh[26:30])
            f.seek(info.header_offset + 30 + name_len + extra_len)
            raw = f.read(info.compress_size)
            if info.compress_type == zipfile.ZIP_STORED:
                data = raw
            elif info.compress_type == zipfile.ZIP_DEFLATED:
                data = zlib.decompress(raw, -15)
            else:
                with zf.open(info) as m:  # rare codecs: fall back
                    data = m.read()
            out[name[:-4]] = _parse_npy(data)
    return out


def _parse_npy(data: bytes) -> np.ndarray:
    if data[:6] != b"\x93NUMPY":
        raise ValueError("not an npy member")
    major = data[6]
    if major == 1:
        (hlen,) = struct.unpack("<H", data[8:10])
        off = 10 + hlen
        header = data[10:off]
    else:
        (hlen,) = struct.unpack("<I", data[8:12])
        off = 12 + hlen
        header = data[12:off]
    import ast
    d = ast.literal_eval(header.decode("latin1"))  # repr'd python dict
    dtype = np.dtype(d["descr"])
    shape = d["shape"]
    if d.get("fortran_order"):
        return np.frombuffer(
            data, dtype=dtype, offset=off).reshape(shape, order="F").copy()
    arr = np.frombuffer(data, dtype=dtype, offset=off)
    return arr.reshape(shape)
