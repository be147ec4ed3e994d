#!/usr/bin/env python3
"""Independent oracle for the connected-components-shaped queries at
scales where DuckDB's recursive CTE cannot go (round-16 verdict #2: at
500k docs the `reach` fixpoint spills >75 GB of temp and exhausts the
box — so q134/q154/q159 were pinned at sf10 only by engine
cross-checks).

The trick: the recursion is the ONLY infeasible part. Every CC-shaped
oracle in oracle_sql.json has the same tail —

    <non-recursive pair pipeline>,
    edges AS (...), reach AS (<recursive>), comp AS (...),
    labeled AS (SELECT ... FROM documents d LEFT JOIN comp ...
                [WHERE d.doc_id % 10 NOT IN (...)])
    SELECT doc_id, canonical_id, count(*) OVER (...) AS cluster_size

so this tool splits the SQL at `edges AS (`, runs the still-DuckDB-
feasible pair prefix (shingle -> minhash -> LSH bands -> exact-Jaccard
verify), replaces the transitive closure with a sequential union-find
over the verified pair list (labels = component minimum, the same
canonicalization), applies the labeled-CTE's document filter, and
compares (doc_id, canonical_id, cluster_size) EXACTLY against the
engine's dumped parquet. DuckDB computes the pairs, Python computes the
closure — no engine code anywhere in the oracle path.

Usage: python3 tools/cc_oracle.py <sfDir> <dumpDir> [query ...]
  <dumpDir> must hold oracle_sql.json + <query>/ parquet dumps (the
  ScaleGate sf10 dump dir has exactly this shape). Default queries:
  the CC trio q134/q154/q159.
"""
import sys, json, glob, os, re
import duckdb
import pandas as pd

DEFAULT = ["q134_stream_components", "q154_retraction_publish",
           "q159_retraction_publish_rebuild"]


def union_find_labels(doc_ids, pairs):
    """Component minimum per doc — the oracles' `least(u, min(v))` over
    the transitive closure, computed the boring sequential way."""
    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min: the smaller id roots, so find() IS the label
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {d: find(d) for d in doc_ids}


def main():
    sfdir, dumpdir = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:] or DEFAULT
    oracle = json.load(open(f"{dumpdir}/oracle_sql.json"))
    con = duckdb.connect()
    # bounded so the oracle can run alongside a live gate; the pair
    # prefix at 500k docs wants tens of GB — let it spill, not swap
    con.sql("SET threads=8")
    con.sql("SET memory_limit='40GB'")
    con.sql("SET temp_directory='/tmp/cc_oracle_spill'")
    p = f"{sfdir}/documents.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{src}')")

    fails = 0
    for name in queries:
        sql = oracle[name]
        cut = sql.find("edges AS (")
        if cut < 0:
            print(f"FAIL {name}: not a CC-shaped oracle (no edges CTE)")
            fails += 1
            continue
        prefix = sql[:cut].rstrip().rstrip(",")
        pair_sql = prefix + "\nSELECT doc_a, doc_b FROM pairs"
        pairs = con.sql(pair_sql).fetchall()

        # the labeled CTE's document universe (and its optional filter)
        tail = sql[cut:]
        fm = re.search(r"WHERE d\.doc_id % 10 NOT IN \(([^)]*)\)", tail)
        where = f"WHERE doc_id % 10 NOT IN ({fm.group(1)})" if fm else ""
        doc_ids = [r[0] for r in
                   con.sql(f"SELECT doc_id FROM documents {where}").fetchall()]

        labels = union_find_labels(doc_ids, pairs)
        sizes = {}
        for d in doc_ids:
            c = labels[d]
            sizes[c] = sizes.get(c, 0) + 1
        expected = sorted((d, labels[d], sizes[labels[d]]) for d in doc_ids)

        files = glob.glob(f"{dumpdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no engine dump under {dumpdir}/{name}")
            fails += 1
            continue
        got_df = pd.concat([pd.read_parquet(f) for f in files])
        got = sorted((int(r.doc_id), int(r.canonical_id), int(r.cluster_size))
                     for r in got_df.itertuples())

        if got == expected:
            comps = len(set(labels.values()))
            print(f"OK   {name}: {len(got)} rows, {len(pairs)} pairs, "
                  f"{comps} components — engine == union-find oracle")
        else:
            fails += 1
            diff = [(g, e) for g, e in zip(got, expected) if g != e][:5]
            print(f"FAIL {name}: rows {len(got)} vs {len(expected)}; "
                  f"first diffs {diff}")

    print(f"{fails} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
