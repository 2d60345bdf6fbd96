"""Maintain PLAN_HASHES.json — the plan-version ledger behind the
driver-window rotation's changed-plan rule (VERDICT r10 item 1).

For every registered query the ledger records:

    {name: {"hash": <plan_hash of builder source + oracle>,
            "since": <first round whose driver record attests it>}}

`registry.driver_order` treats a CORRECTNESS green as valid only when
it is >= `since` AND the live plan_hash still equals the ledger hash;
otherwise the query re-enters tier 1 and is re-verified in the next
driver window. This tool is the ONLY writer:

    python tools/update_plan_hashes.py          # after editing queries
    python tools/update_plan_hashes.py --init   # first-ever generation

Normal mode: entries whose hash changed (or are new) get
since = max committed CORRECTNESS round + 1 (the next driver run is
the first that can attest the new plan); unchanged entries keep their
(hash, since); entries for unregistered names are dropped.

--init mode: writes since = 0 for every query (all existing greens
attest), for bootstrapping the ledger on a repo with a long green
history. After --init, hand-bump `since` for queries known to have
been rewritten after their last green.

tests/test_plans.py::test_plan_hashes_ledger_current fails whenever a
builder/oracle is edited without re-running this tool.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, ".")

from dynaledger_spark.plans.registry import (  # noqa: E402
    _PLAN_HASH_FILE,
    _REPO_ROOT,
    load_all,
    plan_hash,
    plan_state,
)


def latest_correctness_round(root: str = _REPO_ROOT) -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0)


def main() -> int:
    init = "--init" in sys.argv[1:]
    reg = load_all()
    state = {} if init else plan_state()
    next_round = latest_correctness_round() + 1
    changed, new, dropped = [], [], []
    out: dict[str, dict] = {}
    for name, spec in reg.items():
        h = plan_hash(spec)
        prev = state.get(name)
        if init:
            out[name] = {"hash": h, "since": 0}
        elif prev is None:
            out[name] = {"hash": h, "since": next_round}
            new.append(name)
        elif prev.get("hash") != h:
            out[name] = {"hash": h, "since": next_round}
            changed.append(name)
        else:
            out[name] = prev
    dropped = sorted(set(state) - set(reg))
    path = os.path.join(_REPO_ROOT, _PLAN_HASH_FILE)
    with open(path, "w") as fh:
        json.dump({n: out[n] for n in sorted(out)}, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"wrote {path}: {len(out)} entries"
        + (f", since={next_round} for changed={changed} new={new}" if not init else " (init, since=0)")
        + (f", dropped={dropped}" if dropped else "")
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
