"""Regenerate SURVEY.md §8.1 — the exhaustive catalog index.

Every `load_all()` name appears exactly once, grouped by check.py lane,
with the first docstring sentence as its one-line description and a flag
for oracle-gated vs rows-only entries. Run after adding catalog entries:

    python tools/gen_survey_index.py        # rewrites the marked block
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nba_data_pipeline_spark.plans.registry import load_all  # noqa: E402
from tools.check import lane_members  # noqa: E402

BEGIN = "<!-- BEGIN GENERATED CATALOG INDEX (tools/gen_survey_index.py) -->"
END = "<!-- END GENERATED CATALOG INDEX -->"


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    m = re.match(r"(.+?\.)(\s|$)", text)
    s = m.group(1) if m else text
    if len(s) > 220:
        s = s[:217] + "..."
    return s.replace("|", "\\|")


def render() -> str:
    specs = load_all()
    lanes = lane_members(list(specs))
    lines = [
        BEGIN,
        "",
        f"All {len(specs)} catalog entries, grouped by `tools/check.py` "
        "lane. Every entry has a DuckDB oracle twin unless marked "
        "*(rows-only)*.",
        "",
    ]
    for lane, members in lanes.items():
        if not members:
            continue
        lines.append(f"**{lane}** ({len(members)}):")
        lines.append("")
        lines.append("| entry | what it pins |")
        lines.append("|---|---|")
        for n in sorted(members):
            spec = specs[n]
            tag = "" if spec.oracle else " *(rows-only)*"
            lines.append(f"| `{n}`{tag} | {first_sentence(spec.doc)} |")
        lines.append("")
    lines.append(END)
    return "\n".join(lines)


def main() -> int:
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")
    text = open(path, encoding="utf-8").read()
    block = render()
    if BEGIN in text:
        pre = text[: text.index(BEGIN)]
        post = text[text.index(END) + len(END):]
        out = pre + block + post
    else:
        raise SystemExit("SURVEY.md has no generated-index markers; add them once")
    with open(path, "w", encoding="utf-8") as f:
        f.write(out)
    print(f"wrote §8.1 index: {len(load_all())} entries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
