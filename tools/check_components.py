#!/usr/bin/env python3
"""Scale-sane oracle for dd6_dedup_components: a driver-side union-find
over the ORACLE-VERIFIED dd2 candidate pairs (dd6's exact input —
ScaleOpsQueries.minhashPairs feeds both queries).

The catalog's declarative oracle (recursive-CTE transitive closure) is
quadratic in component size — at sf0.5 seed-43 the candidate graph has an
11k-node giant component (sum c² ≈ 1.2e8 walk rows), which DuckDB cannot
replay in reasonable time while the engine's pointer-jumping finishes in
seconds. This checker is O(E α(N)) and works at any SF:

  1. run compare_oracle.py and confirm dd2_minhash_lsh is OK (that
     pins the pair set against DuckDB),
  2. run this over the same Verify out dir to pin dd6 against the pairs.

Usage: check_components.py <verifyOutDir>
"""
import sys, glob
import pandas as pd


def main(out_dir):
    def read_all(sub):
        files = glob.glob(f"{out_dir}/{sub}/*.parquet")
        if not files:
            print(f"MISS {sub}: no parquet files under {out_dir}/{sub} "
                  f"(run Verify first)")
            sys.exit(2)
        return pd.concat(pd.read_parquet(f) for f in files)

    pairs = read_all("dd2_minhash_lsh")
    comp = read_all("dd6_dedup_components")
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs.doc_a.values, pairs.doc_b.values):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = set(pairs.doc_a.tolist()) | set(pairs.doc_b.tolist())
    expect = {n: find(int(n)) for n in nodes}
    got = dict(zip(comp.doc_id.values, comp.comp.values))
    if len(got) != len(expect):
        print(f"FAIL dd6: node count spark={len(got)} unionfind={len(expect)}")
        return 1
    bad = [n for n in expect if got.get(int(n)) != expect[n]]
    if bad:
        n = bad[0]
        print(f"FAIL dd6: {len(bad)} mismatches; first: node {n} "
              f"spark={got.get(int(n))} unionfind={expect[n]}")
        return 1
    sizes = comp.groupby("comp").size().sort_values(ascending=False)
    print(f"OK    dd6_dedup_components (union-find oracle: "
          f"{len(pairs)} pairs, {len(expect)} nodes, "
          f"{len(sizes)} components, largest {int(sizes.iloc[0])})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
