"""Derive a DETERMINISTIC clustered embedding fixture (VERDICT r5 task 4).

The driver's embeddings.parquet is i.i.d. uniform — the documented
WORST case for product quantization (PQ recall@5 floor 0.06-0.16 in
BASELINE.md's round-5 table). Real corpora are anisotropic and
clustered; this tool derives such a table from the existing fixture
with NO random state, so both engines (and any re-run) see identical
bytes:

    centroid[label][d] = (md5("c|label|d") / 2^32) * 2 - 1      in [-1, 1]
    eps[vec_id][d]     = ((md5("e|vec_id|d") / 2^32) - 0.5) * spread
    embedding[vec_id]  = centroid[label(vec_id)] + eps[vec_id]

vec_id and label come from the source fixture unchanged, so every
knn/dedup key runs on the derived dir without modification. The output
directory gets SYMLINKS for every other table, making it a drop-in
sf_dir for tools/ann_recall.py:

    python tools/clustered_embeddings.py [src_sf_dir] [dst_dir]
    python tools/ann_recall.py <dst_dir> --knn-only
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SPREAD = 0.35  # intra-cluster half-width vs ~2.0 inter-centroid scale


def _u01(tag: str) -> float:
    """Deterministic uniform [0,1) from the first 4 md5 bytes of tag."""
    h = hashlib.md5(tag.encode()).digest()
    return int.from_bytes(h[:4], "big") / 2**32


def derive(src_sf_dir: str, dst_dir: str, spread: float = SPREAD) -> str:
    os.makedirs(dst_dir, exist_ok=True)
    src = pq.read_table(os.path.join(src_sf_dir, "embeddings.parquet"))
    vec_ids = src.column("vec_id").to_pylist()
    labels = src.column("label").to_pylist()
    dim = len(src.column("embedding")[0])

    cents = {
        lab: [_u01(f"c|{lab}|{d}") * 2 - 1 for d in range(dim)]
        for lab in sorted(set(labels))
    }
    embs = [
        [cents[lab][d] + (_u01(f"e|{vid}|{d}") - 0.5) * spread
         for d in range(dim)]
        for vid, lab in zip(vec_ids, labels)
    ]
    out = pa.table({
        "vec_id": pa.array(vec_ids, pa.int64()),
        "embedding": pa.array(embs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(out, os.path.join(dst_dir, "embeddings.parquet"))

    for f in os.listdir(src_sf_dir):
        if f == "embeddings.parquet" or not f.endswith(".parquet"):
            continue
        link = os.path.join(dst_dir, f)
        # always repoint (lexists catches broken links too): a reused
        # dst_dir must never silently mix tables from an older source
        if os.path.lexists(link):
            os.remove(link)
        os.symlink(os.path.join(src_sf_dir, f), link)
    return dst_dir


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_clustered"
    print(derive(src, dst))


if __name__ == "__main__":
    main()
