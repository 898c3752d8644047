#!/usr/bin/env python3
"""Hybrid oracle for the connected-component dedup queries at big SFs
(dev tooling only — the shipped library is pure Scala).

The four CC-consuming oracles (dd_dup_clusters, dd_cluster_stats,
dd_survivors, gr2_degree_hist) express the component labeling as a
recursive transitive-closure CTE (`reach` = every (node, reachable-node)
pair, label = min). That closure is O(sum |C|^2) rows; at sf1 the
letter-rotated replicas push the biggest components past what DuckDB can
enumerate in reasonable time (the sf0.1 gate runs it fine — this tool
exists for the 10x evidence tier only).

Same differential posture, cheaper closure: DuckDB still evaluates the
ENTIRE pair predicate (tokenize, bucket, Jaccard >= threshold) straight
from the committed oracle SQL text — we split the query at the shared
`lab AS (...)` CTE boundary, materialize `pairs` via DuckDB, label
components with a Python union-find using min-representative semantics
(provably the same labeling: min(reachable ids) == min of the component),
register `edges_m`/`lab_m`, and run the oracle's remaining tail SQL
unchanged. Spark output is compared with tools/check.py's bit-level
compare. Results merge into an existing check-style --json report.

Usage: python3 tools/cc_oracle.py <sfDir> <verifyOutDir> [--json out.json]
"""
import sys, os, json, glob
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import compare

CC_QUERIES = ["dd_dup_clusters", "dd_cluster_stats", "dd_survivors",
              "gr2_degree_hist", "tp3_corpus_manifest"]
# The shared prefix of all four oracles ends exactly here (byte-identical
# in oracle_sql.json — asserted below, so SQL drift fails loudly).
LAB_CTE = "lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)"
PAIRS_END = "edges AS ("


def union_find_min(pairs):
    """Min-representative component labels over an edge list.

    Path-halving union-find with union-by-min: the root of every tree is
    the smallest id seen so far, so find(x) after full unioning is exactly
    min(component(x)) — the recursive CTE's min(r)."""
    parent = {}

    def find(x):
        r = parent.setdefault(x, x)
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        # path compression pass
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in parent}


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    sf_dir, out_dir = argv[0], argv[1]
    con = duckdb.connect()
    if os.environ.get("CHECK_THREADS"):
        con.execute(f"SET threads = {int(os.environ['CHECK_THREADS'])}")
    p = f"{sf_dir}/documents.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    # 1. pairs via the oracle's own predicate SQL (prefix up to `edges`).
    sql0 = oracle[CC_QUERIES[0]]
    cut = sql0.index(PAIRS_END)
    pairs_sql = sql0[:cut].rstrip().rstrip(",")
    pairs_sql = pairs_sql.replace("WITH RECURSIVE", "WITH", 1) \
        + "\nSELECT doc_a, doc_b FROM pairs"
    print("[cc_oracle] materializing pairs via DuckDB ...", flush=True)
    con.execute(f"CREATE TABLE pairs_m AS {pairs_sql}")
    n_pairs = con.execute("SELECT count(*) FROM pairs_m").fetchone()[0]
    print(f"[cc_oracle] {n_pairs} pairs; union-find ...", flush=True)

    # 2. closure in Python (min-representative union-find).
    labels = union_find_min(con.execute(
        "SELECT doc_a, doc_b FROM pairs_m ORDER BY doc_a, doc_b").fetchall())
    con.execute("CREATE TABLE lab_m (id BIGINT, cluster_id BIGINT)")
    con.executemany("INSERT INTO lab_m VALUES (?, ?)",
                    list(labels.items()))
    con.execute("""CREATE TABLE edges_m AS
      SELECT doc_a AS src, doc_b AS dst FROM pairs_m
      UNION SELECT doc_b, doc_a FROM pairs_m""")
    print(f"[cc_oracle] {len(labels)} labeled nodes", flush=True)

    # 3. each oracle's tail SQL over the materialized closure.
    report, fails = {}, 0
    for name in [q for q in CC_QUERIES if only is None or q in only]:
        sql = oracle[name]
        assert LAB_CTE in sql, f"{name}: lab CTE drifted from cc_oracle"
        tail = sql[sql.index(LAB_CTE) + len(LAB_CTE):]
        rewritten = ("WITH edges AS (SELECT src, dst FROM edges_m),\n"
                     "lab AS (SELECT id, cluster_id FROM lab_m)" + tail)
        want = con.execute(rewritten).df()
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        problems = compare(name, got, want)
        report[name] = {"ok": not problems, "spark_rows": len(got),
                        "oracle_rows": len(want), "problems": problems[:6]}
        if problems:
            fails += 1
            print(f"FAIL {name}:")
            for pr in problems[:6]:
                print(f"   {pr}")
        else:
            print(f"ok   {name} ({len(got)} rows)")

    if json_out:
        merged = {"sf": os.path.basename(sf_dir.rstrip("/")),
                  "result": "FAIL" if fails else "PASS", "queries": {}}
        if os.path.exists(json_out):
            merged = json.load(open(json_out))
        merged["queries"].update(report)
        if fails:
            merged["result"] = "FAIL"
        with open(json_out, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
    print("RESULT:", "FAIL" if fails else "PASS", f"({fails} failing)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
