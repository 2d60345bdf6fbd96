"""Maintain PLAN_HASHES.json — the plan-version ledger behind the
driver-window rotation's changed-plan rule (VERDICT r10 item 1).

For every registered query the ledger records:

    {name: {"hash": <plan_hash — closure of builder + helpers + oracle>,
            "since": <first round whose driver record attests it>}}

`registry.driver_order` treats a CORRECTNESS green as valid only when
it is >= `since` AND the live plan_hash still equals the ledger hash;
otherwise the query re-enters tier 1 and is re-verified in the next
driver window. This tool is the ONLY writer:

    python tools/update_plan_hashes.py          # after editing queries
    python tools/update_plan_hashes.py --init   # first-ever generation

Normal mode: entries whose hash changed (or are new) get
since = next attestable round; unchanged entries keep their
(hash, since); entries for unregistered names are dropped.

The next attestable round is 1 + the max CORRECTNESS round seen in
EITHER the working tree (glob) or git history (`git log --name-only`)
— ADVICE r11 item 4: deriving it from the working tree alone can
mis-attest if a CORRECTNESS file exists only in a commit (or vice
versa), letting a pre-edit green satisfy `since` for the rewritten
plan.

One-time algorithm migration (round 12): plan_hash widened from
builder-source-only to the full static helper closure
(registry.plan_closure_sources), so every stored hash changes.  An
entry whose stored hash still equals legacy_plan_hash(spec) changed
for algorithm reasons only — its builder+oracle are untouched, the old
greens still attest it — so `since` is preserved and only the hash is
rewritten.  An entry matching neither hash was actually edited and is
bumped.  The legacy comparison can never hide a FUTURE helper edit:
once an entry stores a closure hash, a helper edit changes the closure
hash, the stored value matches neither current nor legacy (legacy
never equals a closure hash — different input domains), and the entry
bumps.

--init mode: writes since = 0 for every query (all existing greens
attest), for bootstrapping the ledger on a repo with a long green
history. After --init, hand-bump `since` for queries known to have
been rewritten after their last green.

tests/test_plans.py::test_plan_hashes_ledger_current fails whenever a
builder/oracle/helper is edited without re-running this tool.
"""
from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, ".")

from dynaledger_spark.plans.registry import (  # noqa: E402
    _PLAN_HASH_FILE,
    _REPO_ROOT,
    legacy_plan_hash,
    load_all,
    plan_hash,
    plan_state,
)

_ROUND_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")


def latest_correctness_round(root: str = _REPO_ROOT) -> int:
    """Max round across working-tree AND git-committed CORRECTNESS
    artifacts (ADVICE r11 item 4)."""
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        if (m := _ROUND_RE.search(p))
    ]
    try:
        committed = subprocess.run(
            ["git", "log", "--name-only", "--pretty=format:", "--",
             "CORRECTNESS_r*.json"],
            cwd=root, capture_output=True, text=True, timeout=30,
        ).stdout
        rounds += [
            int(m.group(1))
            for line in committed.splitlines()
            if (m := _ROUND_RE.search(line.strip()))
        ]
    except (OSError, subprocess.SubprocessError):
        pass  # not a git checkout — working tree alone is the best view
    return max(rounds, default=0)


def main() -> int:
    init = "--init" in sys.argv[1:]
    reg = load_all()
    state = {} if init else plan_state()
    next_round = latest_correctness_round() + 1
    changed, new, migrated = [], [], []
    out: dict[str, dict] = {}
    for name, spec in reg.items():
        h = plan_hash(spec)
        prev = state.get(name)
        if init:
            out[name] = {"hash": h, "since": 0}
        elif prev is None:
            out[name] = {"hash": h, "since": next_round}
            new.append(name)
        elif prev.get("hash") == h:
            out[name] = prev
        elif prev.get("hash") == legacy_plan_hash(spec):
            # algorithm migration: builder+oracle unchanged, old greens
            # still attest — rewrite the hash, keep since.
            out[name] = {"hash": h, "since": prev.get("since", 0)}
            migrated.append(name)
        else:
            out[name] = {"hash": h, "since": next_round}
            changed.append(name)
    dropped = sorted(set(state) - set(reg))
    path = os.path.join(_REPO_ROOT, _PLAN_HASH_FILE)
    with open(path, "w") as fh:
        json.dump({n: out[n] for n in sorted(out)}, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"wrote {path}: {len(out)} entries"
        + (
            f", since={next_round} for changed({len(changed)})={changed} "
            f"new({len(new)})={new}, migrated({len(migrated)}) kept since"
            if not init
            else " (init, since=0)"
        )
        + (f", dropped={dropped}" if dropped else "")
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
