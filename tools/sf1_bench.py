"""Whole-suite scaling datapoint: headline + TPC-H at a clean 10x of
sf0.1 ("sf1"-scale facts: ~6M lineitem rows, 2M events, 500k docs).

The 100 TB posture otherwise rests on sf0.1 plus per-operator 10x+skew
probes (tools/scale_probe.py); this run confirms the SUITE scales with
shuffle volume, not constants — the pass bar is wall(sf1) <= 2x the
row-count-scaled sf0.1 floor, i.e. ratio <= 20 per query, with the
expected profile being far below (fixed per-query overheads amortize;
scan-bound queries land near the I/O ratio).

Run: python tools/sf1_bench.py          (headline + TPC-H; ~10 min)
     python tools/sf1_bench.py --all    (FULL registry; ~45-90 min)
     python tools/sf1_bench.py q1 q2    (named queries only)
     python tools/sf1_bench.py --mult 100 [names...]
         clean-100x ("sf10": ~60M lineitem / 20M events / 5M docs /
         200k embeddings) — the VERDICT r12 item-1 datapoint; bar is
         ratio <= 2x rows = 200
Results are transcribed into BASELINE.md ("sf1" / "sf10" sections).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynaledger_spark.plans.registry import load_all
from dynaledger_spark.session import get_spark
from tools.scale_probe import SF1, build_probe


def main() -> None:
    argv = sys.argv[1:]
    mult = 10
    if "--mult" in argv:
        i = argv.index("--mult")
        mult = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    corpus_dir = None
    if "--dir" in argv:
        # persistent corpus shared with full_parity_sweep --dir: build
        # only if absent, never delete
        i = argv.index("--dir")
        corpus_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    spark = get_spark("sf1_bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    reg = load_all()
    if argv == ["--all"]:
        names = sorted(reg)
    else:
        names = argv or (
            [n for n, s in reg.items() if s.headline]
            + sorted(n for n in reg if n.startswith("tpch_"))
        )
    bad = [n for n in names if n not in reg]
    if bad:
        sys.exit(f"sf1_bench: unrecognized query names: {bad}")

    if corpus_dir is not None:
        dest = corpus_dir
        if not os.path.exists(os.path.join(dest, "lineitem.parquet")):
            build_probe(spark, dest, mult=mult, skew=False)
    else:
        dest = tempfile.mkdtemp(prefix=f"dl_sf{mult // 10}_")
    try:
        if corpus_dir is None:
            build_probe(spark, dest, mult=mult, skew=False)

        def run(sf_dir: str) -> dict[str, float]:
            out = {}
            for name in names:
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    try:
                        reg[name].build(spark, sf_dir).write.mode("overwrite").format(
                            "noop"
                        ).save()
                    except Exception as exc:  # record, keep sweeping
                        print(f"# sf1_bench FAILED {name}: {str(exc)[:200]}")
                        best = -1.0
                        break
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                    if dt <= 2.0:
                        break
                out[name] = best
                # builders persist() intra-plan intermediates; drop between
                # queries so a full-registry sweep doesn't accumulate cache
                try:
                    spark.catalog.clearCache()
                except Exception:
                    pass
            return out

        base = run(SF1)
        big = run(dest)
        bar = 2 * mult
        print(f"\n{'query':38s} {'sf0.1':>7s} {f'{mult}x':>8s} {'ratio':>6s}")
        worst = 0.0
        fams: dict[str, list[float]] = {}
        for name in names:
            if base[name] < 0 or big[name] < 0:
                print(f"{name:38s} FAILED")
                continue
            r = big[name] / base[name]
            worst = max(worst, r)
            fams.setdefault(reg[name].build.__module__.rsplit(".", 1)[-1], []).append(r)
            flag = f"  <-- over {bar}x row-scaled bar" if r > bar else ""
            print(f"{name:38s} {base[name]:7.2f} {big[name]:8.2f} {r:6.1f}{flag}")
        print(f"\nper-family ratios (n, median, max):")
        for fam in sorted(fams):
            rs = sorted(fams[fam])
            print(f"  {fam:24s} n={len(rs):3d}  med={rs[len(rs)//2]:5.1f}  max={rs[-1]:5.1f}")
        print(
            f"\nworst ratio: {worst:.1f}x "
            f"(bar: {bar}x = 2x per-row floor at {mult}x rows)"
        )
    finally:
        if corpus_dir is None:
            shutil.rmtree(dest, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
