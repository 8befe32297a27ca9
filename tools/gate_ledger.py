"""Driver-gate freshness ledger + mechanical window selection.

The driver's correctness gate checks only the FIRST 50 entries of
``__spark_entry__.queries()`` each round, so which entries occupy those
slots is a coverage decision. Historically that decision was curation
prose in the registry comments; this tool makes it mechanical
(VERDICT r4, item 7):

1. **Ledger**: for every registry entry, ``last_gated_round`` = the
   highest round whose ``CORRECTNESS_r*.json`` holds a fully green row
   (rows + schema + hash) for it, or 0 if never driver-gated.
2. **Window selection** for the next round, priority order:
     a. ``--changed`` entries — anything whose engine/oracle code
        changed since its last gated round (maintained by the rotation;
        changed code MUST re-gate regardless of history),
     b. ``--pin`` entries — explicit reserve slots (e.g. judge-named),
     c. everything else ascending by ``last_gated_round`` (never-gated
        first), tie-broken by current registry position (which encodes
        the accumulated "first past the marker" rotation order).
3. Entries past the window keep their current relative order, so the
   registry position tiebreak remains a stable rotation queue.

Usage:
    PYTHONPATH=/root/repo python tools/gate_ledger.py \
        [--changed q_a q_b ...] [--pin q_x q_y ...] [--window 50] [--emit]

``--emit`` prints the full proposed registry order (one name per line,
window first) for splicing into ``queries()``; without it the tool
prints the ledger table and the proposed window with per-slot reasons.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def load_ledger(repo: str) -> tuple[list[str], dict[str, int]]:
    """Registry order + {name: last fully-green driver-gated round (0=never)}."""
    import __spark_entry__ as e

    names = list(e.queries())
    last: dict[str, int] = {n: 0 for n in names}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if name not in last:
                continue
            ok = bool(
                row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
            )
            if ok and rnd > last[name]:
                last[name] = rnd
    return names, last


def select_window(
    names: list[str],
    last: dict[str, int],
    changed: list[str],
    pins: list[str],
    window: int = WINDOW,
) -> list[tuple[str, str]]:
    """Return [(name, reason)] for the next gate window, in slot order."""
    pos = {n: i for i, n in enumerate(names)}
    for n in changed + pins:
        if n not in pos:
            raise SystemExit(f"unknown registry entry: {n}")
    out: list[tuple[str, str]] = []
    seen: set[str] = set()
    for n in changed:
        if n not in seen:
            out.append((n, "changed since last gate"))
            seen.add(n)
    for n in pins:
        if n not in seen:
            out.append((n, "pinned"))
            seen.add(n)
    rest = sorted(
        (n for n in names if n not in seen),
        key=lambda n: (last[n], pos[n]),
    )
    for n in rest:
        if len(out) >= window:
            break
        why = "never gated" if last[n] == 0 else f"stale (last gated r{last[n]})"
        out.append((n, why))
    return out[:window]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--changed", nargs="*", default=[])
    ap.add_argument("--pin", nargs="*", default=[])
    ap.add_argument("--window", type=int, default=WINDOW)
    ap.add_argument("--emit", action="store_true")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names, last = load_ledger(repo)
    win = select_window(names, last, args.changed, args.pin, args.window)
    win_names = [n for n, _ in win]

    if args.emit:
        tail = [n for n in names if n not in set(win_names)]
        for n in win_names + tail:
            print(n)
        return

    never = sum(1 for n in names if last[n] == 0)
    print(f"registry: {len(names)} entries; never-gated: {never}")
    print(f"\nproposed window ({len(win)} slots):")
    for i, (n, why) in enumerate(win):
        print(f"  {i:3d} {n:28s} {why}")
    fresh = sum(1 for n in win_names if last[n] != max(last.values()))
    print(f"\nslots not holding a round-{max(last.values())} green row: {fresh}")
    print("\nledger (name, last_gated_round):")
    for n in names:
        print(f"  {n:32s} r{last[n]}")


if __name__ == "__main__":
    main()
