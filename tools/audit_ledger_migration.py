"""One-time audit of the round-12 plan-hash migration (ADVICE r12 item 1).

The r12 migration rewrote PLAN_HASHES.json from builder-only hashes to
full-closure hashes, preserving `since` whenever the stored hash equaled
legacy_plan_hash(spec) — reasoning that the builder+oracle were untouched
so the old greens still attest. But the legacy hash was blind to HELPER
edits: an entry whose shared helper was edited after its last green but
before round 12 kept its old `since`, and its stale green attests forever.

This tool closes that window exactly (not conservatively): for every
ledger entry with since <= 11 whose last driver green G is also <= 11, it

  1. checks out a git worktree at the commit that recorded
     CORRECTNESS_rG.json (the code the green actually attested),
  2. computes the CURRENT closure hash (today's walker, vendored into the
     subprocess via the current registry.py source) over that OLD tree,
  3. compares it to the entry's current ledger hash.

Equal  -> nothing in the entry's closure (builder, helpers, constants,
          oracle) changed since the green; the green attests the current
          plan and `since` is correct.
Differ -> something in the closure moved after the green; the migration
          should have bumped it. With --apply, `since` is bumped to the
          next attestable round so driver rotation re-verifies it.

Entries whose last green is >= 12 were recorded under the closure-hash
regime (ledger current => the green attests the current closure) and are
skipped. Entries missing from the old registry, or erroring in the old
tree, are flagged conservatively.

Usage:
    python tools/audit_ledger_migration.py           # report only
    python tools/audit_ledger_migration.py --apply   # bump flagged since
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, ".")

from dynaledger_spark.plans.registry import (  # noqa: E402
    _PLAN_HASH_FILE,
    _REPO_ROOT,
    correctness_history,
    plan_state,
)
from tools.update_plan_hashes import latest_correctness_round  # noqa: E402

_SUBPROC = r"""
import importlib.util
import json
import sys
import types

wt, names_path, out_path, cur_registry = sys.argv[1:5]
sys.path.insert(0, wt)
names = json.load(open(names_path))
# pre-r6 trees have no plans/cache.py; today's registry.py imports it at
# module level — stub it (the walker never calls into it)
try:
    import dynaledger_spark.plans.cache  # noqa: F401
except Exception:
    import dynaledger_spark.plans as _p

    stub = types.ModuleType("dynaledger_spark.plans.cache")
    sys.modules["dynaledger_spark.plans.cache"] = stub
    _p.cache = stub
from dynaledger_spark.plans.registry import load_all  # the OLD tree's

spec = importlib.util.spec_from_file_location("cur_registry", cur_registry)
cur = importlib.util.module_from_spec(spec)
sys.modules["cur_registry"] = cur  # dataclasses resolves cls.__module__
spec.loader.exec_module(cur)

reg = load_all()
out = {}
for n in names:
    if n not in reg:
        out[n] = None
    else:
        try:
            out[n] = cur.plan_hash(reg[n])
        except Exception as e:  # noqa: BLE001
            out[n] = "ERR:" + repr(e)[:200]
json.dump(out, open(out_path, "w"))
"""


def _artifact_commit(rnd: int) -> str:
    """Commit that first added CORRECTNESS_r{rnd}.json."""
    got = subprocess.run(
        ["git", "log", "--diff-filter=A", "--format=%H", "--",
         f"CORRECTNESS_r{rnd:02d}.json", f"CORRECTNESS_r{rnd}.json"],
        cwd=_REPO_ROOT, capture_output=True, text=True, check=True,
    ).stdout.split()
    if not got:
        raise RuntimeError(f"no commit adds CORRECTNESS_r{rnd}.json")
    return got[-1]  # oldest (first add)


def main() -> int:
    apply = "--apply" in sys.argv[1:]
    state = plan_state()
    hist = correctness_history()
    by_round: dict[int, list[str]] = {}
    for name, entry in state.items():
        if entry.get("since", 0) > 11:
            continue  # bumped at/after migration: closure hash already governs
        g = hist.get(name)
        if g is None:
            print(f"FLAG {name}: no green history at all")
            continue
        if g >= 12:
            continue  # green recorded under the closure-hash regime
        by_round.setdefault(g, []).append(name)

    cur_registry = os.path.join(
        _REPO_ROOT, "dynaledger_spark", "plans", "registry.py"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    flagged: dict[str, str] = {}
    checked = 0
    for rnd in sorted(by_round):
        names = sorted(by_round[rnd])
        commit = _artifact_commit(rnd)
        wt = tempfile.mkdtemp(prefix=f"dl_audit_r{rnd}_")
        subprocess.run(
            ["git", "worktree", "add", "--force", "--detach", wt, commit],
            cwd=_REPO_ROOT, check=True, capture_output=True,
        )
        try:
            with tempfile.NamedTemporaryFile(
                "w", suffix=".json", delete=False
            ) as nf:
                json.dump(names, nf)
                names_path = nf.name
            out_path = names_path + ".out"
            script_path = names_path + ".py"
            with open(script_path, "w") as fh:
                fh.write(_SUBPROC)
            proc = subprocess.run(
                [sys.executable, script_path, wt, names_path, out_path,
                 cur_registry],
                cwd=wt, env=env, capture_output=True, text=True, timeout=600,
            )
            if proc.returncode != 0:
                print(f"round {rnd} ({commit[:8]}): subprocess FAILED — "
                      f"flagging all {len(names)}:\n{proc.stderr[-2000:]}")
                for n in names:
                    flagged[n] = f"r{rnd}: old-tree load failed"
                continue
            old_hashes = json.load(open(out_path))
            for n in names:
                checked += 1
                old = old_hashes.get(n)
                cur_h = state[n]["hash"]
                if old == cur_h:
                    continue
                flagged[n] = (
                    f"r{rnd}: closure at green-time {old!r} != current "
                    f"{cur_h!r}"
                )
            print(f"round {rnd} ({commit[:8]}): {len(names)} checked, "
                  f"{sum(1 for n in names if n in flagged)} flagged")
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=_REPO_ROOT, capture_output=True,
            )

    print(f"\nTOTAL: {checked} audited, {len(flagged)} stale")
    for n, why in sorted(flagged.items()):
        print(f"  {n}: {why}")
    if apply and flagged:
        next_round = latest_correctness_round() + 1
        path = os.path.join(_REPO_ROOT, _PLAN_HASH_FILE)
        ledger = json.load(open(path))
        for n in flagged:
            ledger[n]["since"] = next_round
        with open(path, "w") as fh:
            json.dump(ledger, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"applied: since={next_round} for {len(flagged)} entries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
