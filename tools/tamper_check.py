#!/usr/bin/env python3
"""Dev-only adversarial validation of the CERTIFICATE oracles — the
dd_articulation / dd_bridges palm-tree certificate and the
ann_graph_walk walk certificate: each tamper class mutates the dumped
certificate (or forges a structurally-plausible fake) and asserts the
oracle POISONS the full output — i.e. every check is load-bearing.

Usage: python3 tools/tamper_check.py /root/testdata/sf0.01 /tmp/verify_out
(run tools/local_check.py first so verify_out holds a PASSING dump;
the walk section needs an ann_graph_walk dump in the same dir).
"""
import duckdb
import glob
import json
import os
import re
import shutil
import sys

import pandas as pd

TABLES = ["documents"]


def run_oracle(con, sql, src_glob, tamper_dir):
    s = sql.replace(src_glob, f"{tamper_dir}/*.parquet")
    return con.execute(s).df()


def poisoned(df):
    # every poison path writes comp = -999 on all rows (or, for
    # dd_bridges, doc_a = -999); an EMPTY result also counts only if
    # the untampered table was non-empty — callers assert that.
    col = "comp" if "comp" in df.columns and "doc_a" not in df.columns else "doc_a"
    return len(df) > 0 and (df[col] == -999).all()


def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    sql = oracle["dd_articulation"]
    src_glob = re.search(r"read_parquet\('([^']*dd_articulation[^']*)'\)", sql).group(1)
    base = pd.concat([pd.read_parquet(f)
                      for f in sorted(glob.glob(src_glob))]).reset_index(drop=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    work = "/tmp/tamper_art"
    shutil.rmtree(work, ignore_errors=True)

    def check(name, df, expect_poison=True):
        d = f"{work}/{name}"
        os.makedirs(d)
        df.to_parquet(f"{d}/part.parquet", index=False)
        out = run_oracle(con, sql, src_glob, d)
        ok = poisoned(out) == expect_poison
        print(f"{'PASS' if ok else 'FAIL':>6} {name}: "
              f"{'poisoned' if poisoned(out) else 'NOT poisoned'}")
        return ok

    results = [check("untampered", base, expect_poison=False)]

    # pick a non-root node with a parent, inside a multi-node component.
    # Assert the corpus preconditions loudly (round-15 advice: a raw
    # IndexError from .iloc[0] on a degenerate corpus is undiagnosable).
    assert base.parent.notna().any(), (
        "tamper harness needs at least one multi-node component in the "
        "pair graph (no node has a parent) — regenerate a larger corpus")
    nr = base[base.parent.notna()].iloc[0]
    i = base.index[base.doc_id == nr.doc_id][0]

    t = base.copy(); t.loc[i, "is_articulation"] = ~t.loc[i, "is_articulation"]
    results.append(check("verdict-flip", t))

    t = base.copy(); t.loc[i, "comp"] = t.loc[i, "doc_id"]
    results.append(check("comp-relabel", t))

    # repoint the parent at a node it shares no edge with (its own
    # component minimum is never adjacent to everything; use a root of
    # ANOTHER component to force both edge and comp violations)
    others = base[(base.parent.isna()) & (base.comp != nr.comp)]
    assert len(others) > 0, (
        "tamper harness needs >=2 components in the pair graph (no root "
        "outside the probe node's component) — regenerate a larger corpus")
    other_root = others.iloc[0]
    t = base.copy(); t.loc[i, "parent"] = other_root.doc_id
    results.append(check("parent-repoint", t))

    # swap disc between two nodes of the same component
    same = base[(base.comp == nr.comp) & (base.doc_id != nr.doc_id)].iloc[0]
    j = base.index[base.doc_id == same.doc_id][0]
    t = base.copy()
    t.loc[i, "disc"], t.loc[j, "disc"] = base.loc[j, "disc"], base.loc[i, "disc"]
    results.append(check("disc-swap", t))

    t = base.copy(); t.loc[i, "low"] = t.loc[i, "low"] + 1
    results.append(check("low-bump", t))

    results.append(check("dropped-row", base.drop(index=i)))
    results.append(check("duplicated-row", pd.concat([base, base.iloc[[i]]])))

    t = base.copy(); t.loc[i, "fin"] = None
    results.append(check("null-field", t))

    # THE STRUCTURAL CLASS: a BFS (non-palm) tree on a 4-cycle with
    # internally-consistent disc/fin/low and the verdicts those values
    # imply — every check EXCEPT the palm property accepts it, yet the
    # verdict is WRONG (a 4-cycle has no articulation point). Proves
    # the palm check is load-bearing, not decorative. Fake corpus +
    # fake pair graph stand in for the real views.
    con2 = duckdb.connect()
    os.makedirs(f"{work}/c4")
    pd.DataFrame({"doc_id": [1, 2, 3, 4]}).to_parquet(f"{work}/c4/docs.parquet")
    pd.DataFrame({"doc_a": [1, 2, 3, 1], "doc_b": [2, 3, 4, 4]}).to_parquet(
        f"{work}/c4/pairs.parquet")
    con2.execute(f"CREATE VIEW documents AS SELECT * FROM '{work}/c4/docs.parquet'")
    bfs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4], "comp": [1, 1, 1, 1],
        "parent": [None, 1, 2, 1], "disc": [1, 2, 3, 6],
        "fin": [8, 5, 4, 7], "low": [1, 2, 3, 6],
        "is_articulation": [True, True, False, False]})
    bfs["parent"] = bfs["parent"].astype("Int64")
    os.makedirs(f"{work}/c4cert")
    bfs.to_parquet(f"{work}/c4cert/part.parquet", index=False)
    aux_glob = re.search(r"read_parquet\('([^']*dd_pairs[^']*)'\)", sql).group(1)
    s = sql.replace(src_glob, f"{work}/c4cert/*.parquet") \
           .replace(aux_glob, f"{work}/c4/pairs.parquet")
    out = con2.execute(s).df()
    ok = poisoned(out)
    print(f"{'PASS' if ok else 'FAIL':>6} bfs-non-palm-tree: "
          f"{'poisoned' if ok else 'NOT poisoned — palm check dead!'}")
    results.append(ok)

    # ---- walk certificates (ann_graph_walk + its adaptive twin) ----
    for wop in ("ann_graph_walk", "ann_graph_walk_adaptive"):
        wsql = oracle.get(wop)
        if not wsql:
            continue
        wsrc = re.search(
            rf"read_parquet\('([^']*{wop}[^']*)'\)", wsql).group(1)
        wbase = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(wsrc))
                           ]).reset_index(drop=True).sort_values(
                               ["query_id", "step"]).reset_index(drop=True)
        wcon = duckdb.connect()
        wcon.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'")

        def wcheck(name, df, expect_poison=True, _sql=wsql, _src=wsrc, _op=wop):
            d = f"{work}/{_op}_{name}"
            os.makedirs(d)
            df.to_parquet(f"{d}/part.parquet", index=False)
            out = wcon.execute(
                _sql.replace(_src, f"{d}/*.parquet")).df()
            pz = len(out) > 0 and (out["step"] == -999).all()
            ok = pz == expect_poison
            print(f"{'PASS' if ok else 'FAIL':>6} {_op}:{name}: "
                  f"{'poisoned' if pz else 'NOT poisoned'}")
            return ok

        results.append(wcheck("untampered", wbase, expect_poison=False))
        # the longest walk gives room for mid-path tampering
        qlen = wbase.groupby("query_id")["step"].max()
        q = qlen.idxmax()
        wq = wbase[wbase.query_id == q]
        assert qlen[q] >= 1, "need a walk with >=1 hop for walk tampering"
        last = wq.index[-1]

        t = wbase.copy(); t.loc[last, "node"] = int(wq.iloc[0]["node"])
        results.append(wcheck("node-swap", t))

        t = wbase.copy(); t.loc[wq.index[0], "node"] = int(t.loc[last, "node"])
        results.append(wcheck("entry-swap", t))

        t = wbase.copy(); t.loc[last, "sim"] = t.loc[last, "sim"] + 0.0001
        results.append(wcheck("sim-bump", t))

        results.append(wcheck("dropped-final-hop", wbase.drop(index=last)))
        results.append(wcheck("dropped-query",
                              wbase[wbase.query_id != q]))
        results.append(wcheck("duplicated-step",
                              pd.concat([wbase, wbase.loc[[last]]])))
        if qlen[q] >= 2:
            # skip a middle hop and renumber: edges no longer consecutive
            mid = wq.index[1]
            t = wbase.drop(index=mid).copy()
            sel = t.query_id == q
            t.loc[sel, "step"] = range(int(sel.sum()))
            results.append(wcheck("skipped-hop", t))

    # ---- contracted articulation (palm cert on the sparsifier H plus
    # the co-block lift to the full pair graph) ----
    csql = oracle.get("dd_articulation_contracted")
    if csql:
        csrc = re.search(
            r"read_parquet\('([^']*dd_articulation_contracted[^']*)'\)",
            csql).group(1)
        hglob = re.search(
            r"read_parquet\('([^']*dd_h_edges[^']*)'\)", csql).group(1)
        cbase = pd.concat([pd.read_parquet(f)
                           for f in sorted(glob.glob(csrc))]
                          ).sort_values("doc_id").reset_index(drop=True)
        hbase = pd.concat([pd.read_parquet(f)
                           for f in sorted(glob.glob(hglob))]
                          ).reset_index(drop=True)
        ccon = duckdb.connect()
        for t_ in TABLES:
            ccon.execute(
                f"CREATE VIEW {t_} AS SELECT * FROM '{sf_dir}/{t_}.parquet'")

        def ccheck(name, cert_df, h_df=None, expect_poison=True):
            d = f"{work}/ctr_{name}"
            os.makedirs(f"{d}/cert")
            cert_df.to_parquet(f"{d}/cert/part.parquet", index=False)
            s = csql.replace(csrc, f"{d}/cert/*.parquet")
            if h_df is not None:
                os.makedirs(f"{d}/h")
                h_df.to_parquet(f"{d}/h/part.parquet", index=False)
                s = s.replace(hglob, f"{d}/h/*.parquet")
            out = ccon.execute(s).df()
            pz = poisoned(out)
            ok = pz == expect_poison
            print(f"{'PASS' if ok else 'FAIL':>6} contracted:{name}: "
                  f"{'poisoned' if pz else 'NOT poisoned'}")
            return ok

        results.append(ccheck("untampered", cbase, expect_poison=False))

        cnr = cbase[cbase.parent.notna()].iloc[0]
        ci = cbase.index[cbase.doc_id == cnr.doc_id][0]
        t = cbase.copy()
        t.loc[ci, "is_articulation"] = ~t.loc[ci, "is_articulation"]
        results.append(ccheck("verdict-flip", t))

        # an H edge that is not a pair-graph edge must poison (viol_hsub
        # at minimum); append an edge between the two lowest doc ids that
        # share no pair
        pairs_glob = re.search(
            r"read_parquet\('([^']*dd_pairs[^']*)'\)", csql).group(1)
        pgr = pd.concat([pd.read_parquet(f)
                         for f in sorted(glob.glob(pairs_glob))])
        pset = set(zip(pgr.doc_a, pgr.doc_b))
        ids = sorted(cbase.doc_id)
        fake = next((a, b) for a in ids for b in ids
                    if a < b and (a, b) not in pset)
        results.append(ccheck(
            "fake-h-edge", cbase,
            h_df=pd.concat([hbase, pd.DataFrame(
                {"doc_a": [fake[0]], "doc_b": [fake[1]]})])))

        # THE STRUCTURAL CLASS for the co-block lift: dump the DFS TREE
        # as H with the tree's own (internally consistent) low values
        # and verdicts — every palm/low/verdict/comp check accepts it
        # (a tree is a valid palm graph of itself: no non-tree edges,
        # low = disc everywhere, every internal vertex an articulation
        # point), yet the verdicts are WRONG for the full pair graph.
        # ONLY viol_blocks catches it: every dropped non-tree edge's
        # endpoints sit in different single-edge blocks of the tree.
        tf = cbase.copy()
        tf["low"] = tf["disc"]
        nchild = tf[tf.parent.notna()].groupby("parent").size()
        tf["is_articulation"] = tf.apply(
            lambda r: (nchild.get(r.doc_id, 0) >= 2) if pd.isna(r.parent)
            else (nchild.get(r.doc_id, 0) >= 1), axis=1)
        tree_rows = tf[tf.parent.notna()]
        h_tree = pd.DataFrame({
            "doc_a": [min(a, b) for a, b in
                      zip(tree_rows.doc_id, tree_rows.parent.astype(int))],
            "doc_b": [max(a, b) for a, b in
                      zip(tree_rows.doc_id, tree_rows.parent.astype(int))]})
        assert len(pset) > len(h_tree), (
            "corpus pair graph must have non-tree edges or the "
            "spanning-tree forgery is vacuous")
        assert (tf.is_articulation != cbase.is_articulation).any(), (
            "tree verdicts happen to equal the real verdicts — forgery "
            "would be vacuous; regenerate a corpus with a cycle")
        results.append(ccheck("spanning-tree-forgery", tf, h_df=h_tree))

        # ---- contracted bridges (round 16): same palm+lift chain, the
        # bridge emit — re-prove the checks load-bearing in THIS oracle
        # (it gates a different emit on the same poison2) ----
        bsql = oracle.get("dd_bridges_contracted")
        if bsql:
            bsrc = re.search(
                r"read_parquet\('([^']*dd_cdfs[^']*)'\)", bsql).group(1)
            # re-derive the H glob from the BRIDGE oracle itself: if it
            # ever diverged from the articulation oracle's dd_h_edges
            # path, substituting the articulation hglob would silently
            # no-op and the forgery classes below would run against the
            # real H — vacuous coverage that still prints PASS
            bhm = re.search(r"read_parquet\('([^']*dd_h_edges[^']*)'\)", bsql)
            assert bhm, "bridge oracle no longer reads dd_h_edges — " \
                "the spanning-tree forgery class needs rewiring"
            bhglob = bhm.group(1)
            bbase = pd.concat([pd.read_parquet(f)
                               for f in sorted(glob.glob(bsrc))]
                              ).sort_values("doc_id").reset_index(drop=True)

            def bcheck(name, cert_df, h_df=None, expect_poison=True):
                d = f"{work}/brc_{name}"
                os.makedirs(f"{d}/cert")
                cert_df.to_parquet(f"{d}/cert/part.parquet", index=False)
                s = bsql.replace(bsrc, f"{d}/cert/*.parquet")
                if h_df is not None:
                    os.makedirs(f"{d}/h")
                    h_df.to_parquet(f"{d}/h/part.parquet", index=False)
                    assert bhglob in s, "H glob fell out of the bridge oracle"
                    s = s.replace(bhglob, f"{d}/h/*.parquet")
                out = ccon.execute(s).df()
                pz = poisoned(out)
                if name == "untampered":
                    assert len(out) > 0, "bridge list empty — test vacuous"
                ok = pz == expect_poison
                print(f"{'PASS' if ok else 'FAIL':>6} bridges-ctr:{name}: "
                      f"{'poisoned' if pz else 'NOT poisoned'}")
                return ok

            results.append(bcheck("untampered", bbase, expect_poison=False))
            # a low outside the feasible range violates the low fixpoint
            bi = bbase.index[bbase.parent.notna()][0]
            t = bbase.copy()
            t.loc[bi, "low"] = 0
            results.append(bcheck("low-tamper", t))
            # THE SENTINEL CLASS: flatten every low to its disc — the
            # fixpoint check fires (the corpus graph has cycles) AND no
            # tree edge passes the low > parent.disc bridge filter, so
            # the gated emit alone would return ZERO rows and an empty
            # (equally wrong) operator dump would hash-match it; only
            # the unconditional poison sentinel makes this poisoned
            t = bbase.copy()
            t["low"] = t["disc"]
            assert (bbase.low != bbase.disc).any(), (
                "corpus cert already has low == disc everywhere — "
                "the flatten class would be vacuous")
            results.append(bcheck("low-flatten-empties-bridges", t))
            # the spanning-tree forgery against the BRIDGE emit: every
            # tree edge of the forged cert reads as a bridge (low=disc
            # everywhere), a wildly wrong bridge list that passes every
            # palm check — only the co-block lift poisons it
            results.append(bcheck("spanning-tree-forgery", tf, h_df=h_tree))

    print(f"\n{sum(results)}/{len(results)} tamper classes behave")
    return 0 if all(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
