"""Round-end hygiene gate: one command that fails if the repo is about
to end a round in a state a past verdict has flagged.

Checks (each a VERDICT/ADVICE item that has actually bitten a round):
1. COVERAGE.md is regenerated (tools/coverage_ledger.py --check, r5 #2);
2. README's key count matches the live registry (r6 test pin);
3. every never-checked/STALE key fits the driver's 50-slot window
   (fresh-first ordering is only a guarantee while fresh <= 50);
4. no internal-tooling paths leak into package source (r5 "what's
   wrong" #1);
5. the work tree is clean (round artifacts committed, r4/r5 ADVICE).

Usage: python tools/round_check.py   # exit nonzero on any failure
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.normpath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)
sys.path.insert(0, REPO)

WINDOW = 50
# assembled so this file never literally contains what it hunts for
LEAK_PATTERNS = [r"\." + "cla" + "ude", "anthro" + "pic"]
LEAK_SCOPE = ["kafka_hadoop_consumer_spark", "tools", "tests", "bench.py",
              "__spark_entry__.py"]


def main() -> int:
    failures: list[str] = []

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "coverage_ledger.py"),
         "--check"],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        failures.append(f"COVERAGE.md stale: {r.stdout.strip()}"
                        f"{r.stderr.strip()}")

    from kafka_hadoop_consumer_spark.queries import QUERIES

    readme = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"operator inventory \((\d+) keys", readme)
    if not m or int(m.group(1)) != len(QUERIES):
        failures.append(
            f"README key count {m.group(1) if m else '?'} != registry "
            f"{len(QUERIES)}"
        )

    import __spark_entry__ as entry

    ordered = list(entry.queries())
    checked = entry._driver_checked_keys()
    fresh = sum(1 for k in ordered if k not in checked)
    if fresh > WINDOW:
        failures.append(
            f"{fresh} fresh/STALE keys exceed the {WINDOW}-slot driver "
            "window — some will not be evidenced this round"
        )

    for scope in LEAK_SCOPE:
        path = os.path.join(REPO, scope)
        if not os.path.exists(path):
            # a renamed/missing scope must FAIL the gate, not silently
            # scan nothing — this check's whole job is to fail loudly
            failures.append(f"leak-scan scope missing: {scope}")
            continue
        files = []
        if os.path.isfile(path):
            files = [path]
        else:
            for root, _dirs, names in os.walk(path):
                files += [os.path.join(root, n) for n in names
                          if n.endswith(".py")]
        for f in files:
            text = open(f, errors="replace").read()
            for pat in LEAK_PATTERNS:
                if re.search(pat, text, re.IGNORECASE):
                    failures.append(f"leak pattern {pat!r} in {f}")

    r = subprocess.run(["git", "-C", REPO, "status", "--porcelain"],
                       capture_output=True, text=True)
    dirty = [ln for ln in r.stdout.splitlines() if ln.strip()]
    if dirty:
        failures.append(f"work tree not clean ({len(dirty)} paths): "
                        + ", ".join(ln.split()[-1] for ln in dirty[:5]))

    print(f"fresh-window load: {fresh}/{WINDOW}; registry {len(QUERIES)} keys")
    if failures:
        for f in failures:
            print(f"FAIL: {f}")
        return 1
    print("round_check: all clear")
    return 0


if __name__ == "__main__":
    sys.exit(main())
