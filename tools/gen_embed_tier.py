#!/usr/bin/env python3
"""Generate an embeddings-only scale tier for SemDeDup beyond-the-knee
measurement (SCALING.md).

Same recipe as gen_sf1.py's gen_embeddings — N replicas of the
driver's sf0.1 embeddings, each replica r>0 under one seeded
coordinate permutation (an orthogonal transform: within-replica dot
products are preserved exactly, cross-replica cosine is scrambled),
vec_ids offset into disjoint ranges. Replica 0 is sf0.1 verbatim, and
replica seeds match gen_sf1.py (SEED + r), so the 10-replica prefix of
any tier is bit-identical to the sf1 tier's embeddings table.

Usage: gen_embed_tier.py <replicas> <dst_dir>
  e.g. gen_embed_tier.py 30 /root/repo/localdata/embed30   (sf3-equiv, 60k vectors)
       gen_embed_tier.py 100 /root/repo/localdata/embed100 (sf10-equiv, 200k vectors)

Output: <dst_dir>/embeddings.parquet only — point OneQuery's sfDir at
it for the semdedup_* entries (they read nothing else).
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 42

replicas = int(sys.argv[1])
dst = sys.argv[2]
os.makedirs(dst, exist_ok=True)

base = pq.read_table(f"{SRC}/embeddings.parquet")
vecs = np.array(base.column("embedding").to_pylist(), dtype=np.float32)
dim = vecs.shape[1]
span = pc.max(base.column("vec_id")).as_py() + 1
parts = [base]
for r in range(1, replicas):
    perm = np.random.RandomState(SEED + r).permutation(dim)
    permuted = vecs[:, perm]
    t = base.set_column(
        base.schema.get_field_index("vec_id"), "vec_id",
        pa.chunked_array([pc.add(base.column("vec_id").combine_chunks(),
                                 r * span)]))
    t = t.set_column(
        t.schema.get_field_index("embedding"), "embedding",
        pa.chunked_array([pa.array(list(permuted),
                                   type=pa.list_(pa.float32()))]))
    parts.append(t)
out = pa.concat_tables(parts)
# bounded row groups so scan stages parallelize (see gen_sf1.write)
pq.write_table(out, f"{dst}/embeddings.parquet",
               row_group_size=max(2048, out.num_rows // 64))
print(f"wrote {out.num_rows} vectors ({replicas}x sf0.1, dim {dim}) to {dst}")
