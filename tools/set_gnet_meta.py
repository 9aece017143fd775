"""Stamp advice metadata onto an existing .gnet artifact.

Usage: python tools/set_gnet_meta.py <path.gnet> key=value [key=value ...]

Values parse as JSON when possible (so ``denoise_recommended=false`` is a
bool).  Used to record the measured per-scene denoiser finding (PERF.md
"per-scene denoiser" section: the guided filter costs quality on
hard-surface scenes near-converged at SPP=6) on the committed kits.
"""

import json
import struct
import sys

MAGIC = b"GNET0001"


def set_meta(path: str, updates: dict) -> dict:
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != MAGIC:
            raise ValueError(f"{path}: not a .gnet artifact")
        (hlen,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen).decode())
        blob = f.read()
    meta = header.get("meta", {})
    meta.update(updates)
    header["meta"] = meta
    enc = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(enc)))
        f.write(enc)
        f.write(blob)
    return meta


def main(argv):
    path, kvs = argv[0], argv[1:]
    updates = {}
    for kv in kvs:
        k, _, v = kv.partition("=")
        try:
            updates[k] = json.loads(v)
        except json.JSONDecodeError:
            updates[k] = v
    meta = set_meta(path, updates)
    print(f"{path}: meta = {json.dumps(meta)}")


if __name__ == "__main__":
    main(sys.argv[1:])
