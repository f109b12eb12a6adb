"""Build an N×-scaled, FK-consistent replica of a canonical SF directory
(verdict-r5 item 6: one real-data ~sf1 bench point).

The driver's testdata tops out at sf0.1 and /root/testdata is read-only, so
the 10× point is synthesized from sf0.1 the same way tools/scale_check.py
scales the dedup corpora — replicate every FACT table ``mult`` times with
all keys shifted by ``k * ID_STRIDE`` (one consistent stride across
custkey/orderkey/partkey/suppkey/user_id/doc_id/vec_id, so every FK join
resolves within its own replica and join selectivities scale linearly),
while the TPC-H dimension tables (region, nation) stay fixed as the spec
says they do at every SF. Text gets the per-replica vocabulary rename and
embeddings the per-replica orthogonal scramble from scale_check, keeping
near-dup structure linear by construction.

Output: {out}/{table}.parquet with multiple row groups so Spark scans
parallelize. Usage:

    python tools/build_sf_replica.py --mult 10 --out .sf1
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

ID_STRIDE = 10_000_000
DIMS = ("region", "nation")
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(base_dir: str, out_dir: str, mult: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        pd.read_parquet(os.path.join(base_dir, f"{t}.parquet")).to_parquet(
            os.path.join(out_dir, f"{t}.parquet"), index=False
        )
        print(f"{t}: dim copied")
    for t, keys in KEY_COLS.items():
        df = pd.read_parquet(os.path.join(base_dir, f"{t}.parquet"))
        # hoisted: the base matrix is loop-invariant, and rebuilding it from
        # the pandas object column per replica was the dominant cost of the
        # embeddings branch at high --mult (scale_check.build_scaled hoists
        # the identical vstack)
        mat = (
            np.vstack(df["embedding"].to_numpy()).astype(np.float32)
            if t == "embeddings"
            else None
        )
        copies = []
        for k in range(mult):
            c = df.copy()
            for col in keys:
                c[col] = c[col] + k * ID_STRIDE
            if k > 0 and t == "documents":
                tag = f"_r{k}"
                c["text"] = c["text"].map(
                    lambda x: " ".join(w + tag for w in str(x).split())
                )
                c["n_chars"] = c["text"].str.len()
            if k > 0 and t == "embeddings":
                rng = np.random.default_rng(1000 + k)
                perm = rng.permutation(mat.shape[1])
                signs = rng.choice(np.array([-1.0, 1.0], dtype=np.float32), mat.shape[1])
                c["embedding"] = list(mat[:, perm] * signs)
            copies.append(c)
        out = pd.concat(copies, ignore_index=True)
        rg = max(2000, len(out) // 64)
        out.to_parquet(os.path.join(out_dir, f"{t}.parquet"), index=False, row_group_size=rg)
        print(f"{t}: {len(df)} -> {len(out)} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default=".sf1")
    args = ap.parse_args()
    build(args.base, args.out, args.mult)


if __name__ == "__main__":
    main()
