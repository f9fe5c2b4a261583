"""Regenerate tests/.slow_tests.txt from a `pytest --durations=0` log.

Usage:
    python -m pytest tests/ -q --durations=0 > /tmp/d.log
    python tools/mark_slow_tests.py /tmp/d.log [cut_seconds=1.5]

Tests whose setup+call+teardown total >= cut get listed; the conftest marks
them `slow` at collection so `pytest -m "not slow"` stays a <3-min lane.
Also prints per-file totals for eyeballing.
"""

import re
import sys
from collections import defaultdict


def main(path, cut=1.5):
    per_test = defaultdict(float)
    pat = re.compile(r"^\s*([\d.]+)s\s+(call|setup|teardown)\s+(\S+)")
    with open(path) as f:
        for line in f:
            m = pat.match(line)
            if m:
                per_test[m.group(3)] += float(m.group(1))

    slow = sorted(k for k, v in per_test.items() if v >= cut)
    out = "tests/.slow_tests.txt"
    with open(out, "w") as f:
        f.write("# Auto-generated: tests measured >= %.1f s "
                "(setup+call+teardown)\n"
                "# on the 1-CPU reference box. Regenerate with:\n"
                "#   python -m pytest tests/ -q --durations=0 > /tmp/d.log\n"
                "#   python tools/mark_slow_tests.py /tmp/d.log\n" % cut)
        for k in slow:
            f.write(k + "\n")
    total = sum(per_test.values())
    fast = total - sum(v for v in per_test.values() if v >= cut)
    print(f"{len(slow)} slow tests -> {out}; fast lane ~{fast:.0f}s "
          f"of {total:.0f}s measured")

    per_file = defaultdict(float)
    for k, v in per_test.items():
        per_file[k.split("::")[0]] += v
    for fname, s in sorted(per_file.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{s:8.1f}s  {fname}")


if __name__ == "__main__":
    main(sys.argv[1], float(sys.argv[2]) if len(sys.argv) > 2 else 1.5)
