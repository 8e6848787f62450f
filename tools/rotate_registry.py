"""Reorder ``registry.build_queries()`` by driver-check staleness.

The driver samples the FIRST ~50 keys of ``build_queries()`` each round
for its CORRECTNESS gate. To keep every key's driver row fresh (VERDICT
r6 item 3: "no key older than 4 rounds"), this tool reads every
``CORRECTNESS_r*.json`` artifact, computes each key's newest checked
round, and rewrites the dict in ``plans/registry/__init__.py`` ordered
stalest-first (stable within a tier). No-oracle keys listed in
``TAIL_PARKED`` stay last — they get the weaker rows-only check and
should not burn sample slots.

Run from the repo root after each round's artifacts land:

    python tools/rotate_registry.py
"""

from __future__ import annotations

import collections
import glob
import json
import os
import re
import sys

TAIL_PARKED = ["q_approx_distinct", "q_approx_quantiles"]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REG = os.path.join(REPO, "page_rank_hadoop_spark", "plans", "registry", "__init__.py")


def last_checked() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)", os.path.basename(f))
        if m is None:  # unexpected artifact name: skip, don't crash
            continue
        rnd = int(m.group(1))
        for k in json.load(open(f)):
            last[k] = max(last.get(k, 0), rnd)
    return last


def main() -> None:
    last = last_checked()
    src = open(REG).read()
    m = re.search(
        r'(def build_queries\(\) -> dict\[str, QueryFn\]:\n)(    """.*?"""\n)?(.*?return \{)(.*?)(\n    \})',
        src,
        re.S,
    )
    if not m:
        sys.exit("build_queries() pattern not found")
    entries = re.findall(r'"(q_\w+)"', m.group(4))
    rest = [k for k in entries if k not in TAIL_PARKED]
    order = sorted(rest, key=lambda k: last.get(k, 0)) + [
        k for k in TAIL_PARKED if k in entries
    ]
    tiers: dict[object, list[str]] = collections.OrderedDict()
    for k in order:
        tier = "tail" if k in TAIL_PARKED else last.get(k, 0)
        tiers.setdefault(tier, []).append(k)
    doc = (
        '    """Declared queries in DRIVER SAMPLING ORDER (the driver checks the\n'
        "    first ~50 each round). Keys are ordered by staleness — last\n"
        "    driver-checked round ASCENDING — so the stalest cohorts lead and\n"
        "    every key is re-checked within 4 rounds; no-oracle sketch queries\n"
        "    stay parked at the tail (rows-only checks, no sample slot burned).\n"
        '    Regenerate with tools/rotate_registry.py after each round."""\n'
    )
    body = ["    return {"]
    for tier, keys in tiers.items():
        label = (
            "tail-parked: no oracle (rows-only contract)"
            if tier == "tail"
            else f"last driver CORRECTNESS row = round {tier}"
        )
        body.append(f"        # --- staleness tier: {label} ---")
        body.extend(f'        "{k}": {k},' for k in keys)
    body.append("    }")
    # preserve any code between the docstring and `return {` (group 3
    # minus its trailing `return {` line) — dropping it would silently
    # delete future locals/comments added to build_queries()
    pre = m.group(3)
    pre = pre[: pre.rfind("return {")].rstrip(" ")
    new = m.group(1) + doc + pre + "\n".join(body) + "\n"
    out = src[: m.start()] + new + src[m.end() :]
    # normalize EOF: repeated runs must not accumulate blank lines
    open(REG, "w").write(out.rstrip("\n") + "\n")
    counts = {t: len(ks) for t, ks in tiers.items()}
    print(f"rotated {len(entries)} keys; tiers: {counts}")


if __name__ == "__main__":
    main()
