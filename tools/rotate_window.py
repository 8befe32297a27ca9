"""Regenerate the __spark_entry__.queries() registry order from the gate
ledger (tools/gate_ledger.py) and splice it into the file in place.

Usage:
    PYTHONPATH=/root/repo python tools/rotate_window.py \
        --changed q_a q_b ... --pin q_x q_y ...

The window docstring and section comments are regenerated; entries past
the 50-slot marker keep their current relative order (the rotation queue
for future rounds). A post-splice import sanity check verifies the
registry still loads with unique keys and that every entry has an oracle.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.gate_ledger import load_ledger, select_window  # noqa: E402

DOC_TMPL = '''    """Registry order is the driver-gate window: the FIRST 50 entries
    are value-gated each round. Since r5 the window is selected
    MECHANICALLY by tools/gate_ledger.py (see COVERAGE.md): entries whose
    engine/oracle code changed since their last gated round come first,
    then explicit pins, then everything else ascending by
    last_gated_round (never-gated before stale), tie-broken by registry
    position — so the order below doubles as the rotation queue for
    future rounds. Regenerate with tools/rotate_window.py.

    Current window: {nc} changed-since-last-gate entries, {np} pinned,
    and {nn} ledger-ordered backlog entries; {fresh} of 50 slots were
    not in the previous round's window. Entries past the marker keep
    their newest green driver rows; every registry entry is additionally
    strict-mirrored (tools/check_queries.py, STRICT hash mode, sf0.01)
    before each handoff — see COVERAGE.md."""
'''

SECTION = {
    "changed since last gate": "engine/oracle code changed this round",
    "pinned": "pinned (see COVERAGE.md for rationale)",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--changed", nargs="*", default=[])
    ap.add_argument("--pin", nargs="*", default=[])
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    names, last = load_ledger(REPO)
    win = select_window(names, last, args.changed, args.pin, args.window)
    win_names = [n for n, _ in win]
    tail = [n for n in names if n not in set(win_names)]
    assert len(win_names) + len(tail) == len(names)

    path = os.path.join(REPO, "__spark_entry__.py")
    src = open(path).read()
    m = re.search(
        r"(def queries\(\).*?\n)(    \"\"\".*?\"\"\"\n)(    return \{\n)(.*?\n)(    \}\n)",
        src,
        re.S,
    )
    assert m, "queries() body not found"

    reason = dict(win)
    nc = sum(1 for _, r in win if r == "changed since last gate")
    np_ = sum(1 for _, r in win if r == "pinned")
    nn = len(win) - nc - np_
    prev_window = set(names[: args.window])
    fresh = sum(1 for n in win_names if n not in prev_window)
    doc = DOC_TMPL.format(nc=nc, np=np_, nn=nn, fresh=fresh)

    lines: list[str] = []
    cur = None
    for n in win_names:
        r = reason[n]
        if r != cur:
            lines.append(f"        # --- {SECTION.get(r, r + ', ledger order')} ---")
            cur = r
        lines.append(f'        "{n}": {n},')
    lines.append(
        "        # ===== gate window ends here (first 50 entries) ================"
    )
    lines.append("        # Everything below keeps its newest green driver row (see")
    lines.append("        # tools/gate_ledger.py for the live last_gated_round table)")
    lines.append("        # and queues for future rotations in this order.")
    for n in tail:
        lines.append(f'        "{n}": {n},')

    new = m.group(1) + doc + m.group(3) + "\n".join(lines) + "\n" + m.group(5)
    open(path, "w").write(src[: m.start()] + new + src[m.end():])
    print(f"window: {nc} changed + {np_} pinned + {nn} backlog; fresh {fresh}/{args.window}")

    chk = subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {REPO!r}); "
         "import __spark_entry__ as e, oracle_sql_defs as o; "
         "qs = list(e.queries()); assert len(qs) == len(set(qs)); "
         "missing = [q for q in qs if q not in o.ORACLES]; "
         "assert not missing, missing; print('sanity ok:', len(qs), 'entries')"],
        capture_output=True, text=True,
    )
    print(chk.stdout.strip() or chk.stderr)
    if chk.returncode != 0:
        raise SystemExit("post-splice sanity check FAILED")


if __name__ == "__main__":
    main()
