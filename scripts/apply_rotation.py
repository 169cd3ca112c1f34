"""Rewrite the ``_raw_queries()`` dict body in __spark_entry__.py to the
freshness-sorted order computed by scripts/rotation.py.

The registry ORDER is the driver-prefix rotation schedule (see
rotation.py's module docstring). Hand-reordering a 170-entry dict is
error-prone, so this script regenerates the dict body mechanically:

  python scripts/apply_rotation.py        # rewrite in place
  python scripts/apply_rotation.py --dry  # print the new body

It preserves the leading ORDER-MATTERS comment, groups entries under
`# --- never driver-checked ---` / `# --- last driver-green in rN ---`
section comments derived from the CORRECTNESS history, and assumes each
entry's value expression is exactly its own name (the registry's
convention — asserted before writing).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import rotation  # noqa: E402

ENTRY = os.path.join(rotation.REPO, "__spark_entry__.py")


def current_value_exprs() -> dict[str, str]:
    """name -> value expression for every entry in the current dict."""
    src = open(ENTRY).read()
    m = re.search(
        r"def _raw_queries\(\).*?return \{(.*?)\n    \}", src, re.S
    )
    if not m:
        raise SystemExit("could not locate _raw_queries dict body")
    body = m.group(1)
    out: dict[str, str] = {}
    for line in body.splitlines():
        lm = re.match(r'\s*"([A-Za-z0-9_]+)":\s*(.+?),\s*$', line)
        if lm:
            out[lm.group(1)] = lm.group(2)
    return out


def build_body(order: list[str]) -> str:
    greens = rotation.last_green_rounds()
    exprs = current_value_exprs()
    missing = [n for n in order if n not in exprs]
    if missing:
        raise SystemExit(f"registry entries with unparsed values: {missing}")
    lines: list[str] = []
    cur = None
    for name in order:
        rnd = greens.get(name, 0)
        if rnd != cur:
            cur = rnd
            if rnd == 0:
                lines.append(
                    "        # --- never driver-checked: prefix slots first ---"
                )
            else:
                lines.append(f"        # --- last driver-green in r{rnd} ---")
        lines.append(f'        "{name}": {exprs[name]},')
    return "\n".join(lines)


def main() -> None:
    src = open(ENTRY).read()
    pat = re.compile(r"(def _raw_queries\(\).*?return \{\n)(.*?)(\n    \})", re.S)
    m = pat.search(src)
    if not m:
        raise SystemExit("could not locate _raw_queries dict body")
    # one suggested_order() call feeds BOTH the dict body and the
    # snapshot, so they cannot disagree
    order = rotation.suggested_order()
    new_body = build_body(order)
    if "--dry" in sys.argv:
        print(new_body)
        return
    new_src = src[: m.start(2)] + new_body + src[m.end(2):]
    open(ENTRY, "w").write(new_src)
    # record the prefix this rotation computed — rotation.check()'s
    # round-boundary acceptance verifies the live prefix against it
    rotation.write_snapshot(order)
    print(f"rewrote {len(order)} entries; snapshot {rotation.SNAPSHOT_PATH}")


if __name__ == "__main__":
    main()
