"""Record per-query source hashes for the round the driver is about to check.

Run as (part of) the session's FINAL commit:

    python tools/record_query_hashes.py

It writes ``QUERY_HASHES.json`` at the repo root, keyed by round number =
max(existing CORRECTNESS_r*.json round) + 1 — i.e. the round whose official
check will run against exactly this code. ``__spark_entry__._ordered()``
compares each green query's recorded hash (at its latest-check round)
against the live source and fronts any mismatch for re-certification, so a
rewrite can never coast on a pre-rewrite official green (VERDICT r6 #1).

Idempotent: re-running before the final commit simply refreshes the same
round's entry. Historical rounds are never touched (pre-r7 rounds hold only
seeded sentinels for the queries known rewritten after their check).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sys.path.insert(0, HERE)
    from __spark_entry__ import _current_hashes

    rounds = []
    for p in glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            rounds.append(int(m.group(1)))
    rnd = max(rounds, default=0) + 1

    path = os.path.join(HERE, "QUERY_HASHES.json")
    try:
        with open(path) as f:
            data = json.load(f)
        assert isinstance(data, dict)
    except (OSError, ValueError, AssertionError):
        data = {}

    hashes = dict(sorted(_current_hashes().items()))
    if "--print" in sys.argv or "--dry-run" in sys.argv:
        # audit mode (VERDICT r12 cosmetic): show what WOULD be recorded —
        # live hashes and how they differ from the target round's entry —
        # without touching QUERY_HASHES.json.
        prev = data.get(str(rnd), {})
        changed = sorted(
            n for n, h in hashes.items() if prev.get(n) not in (None, h)
        )
        new = sorted(n for n in hashes if n not in prev)
        print(
            f"dry-run: would record {len(hashes)} query hashes for round "
            f"{rnd} ({len(new)} not yet in that round's entry, "
            f"{len(changed)} changed vs it); nothing written"
        )
        for n in changed:
            print(f"  changed: {n}")
        return 0
    data[str(rnd)] = hashes
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"recorded {len(hashes)} query hashes for round {rnd} -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
