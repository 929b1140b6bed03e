#!/usr/bin/env python3
"""Regenerate SURVEY.md's script-emitted query index.

SURVEY §8's hand-written operator-mapping tables stay hand-written (they
carry design annotations no script can derive), but the PER-QUERY index
— 230+ rows and growing — drifts whenever a query lands. This script
derives it from the source of truth (`"qNNN_name" ->` entries in
src/main/scala/graft/queries/*.scala plus each entry's banner/first
comment line) and splices it between GEN markers, also refreshing the §8
heading's query count. Run after adding queries:

    python3 scripts/gen_survey_index.py          # rewrite SURVEY.md
    python3 scripts/gen_survey_index.py --check  # exit 1 if stale
"""
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
QUERY_DIR = ROOT / "src/main/scala/graft/queries"
SURVEY = ROOT / "SURVEY.md"
BEGIN = "<!-- GEN:QUERY_INDEX:BEGIN (scripts/gen_survey_index.py) -->"
END = "<!-- GEN:QUERY_INDEX:END -->"

ENTRY = re.compile(r'^\s*"(q\d+_[A-Za-z0-9_]+)"\s*->\s*\(\(s, dir\)')
BANNER = re.compile(r"^\s*// -----\s*(.*?)\s*-*\s*$")
COMMENT = re.compile(r"^\s*//\s?(.*)$")


def harvest():
    rows = {}
    for path in sorted(QUERY_DIR.glob("*.scala")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            m = ENTRY.match(line)
            if not m:
                continue
            name = m.group(1)
            desc = ""
            # prefer the banner line above the entry
            for j in range(i - 1, max(i - 4, -1), -1):
                b = BANNER.match(lines[j])
                if b and b.group(1):
                    desc = b.group(1)
                    break
                if lines[j].strip() and not lines[j].strip().startswith("//"):
                    break
            if not desc:  # fallback: first comment line inside the body
                for j in range(i + 1, min(i + 4, len(lines))):
                    c = COMMENT.match(lines[j])
                    if c:
                        desc = c.group(1).strip()
                        break
            rows[name] = (desc, path.name)
    return rows


def qnum(name):
    return int(name.split("_", 1)[0][1:])


def render(rows):
    out = [BEGIN, "",
           f"{len(rows)} oracle-gated queries (every `SparkEntry.queries` key; "
           "each has a DuckDB `oracleSql` twin checked by the driver's "
           "correctness gate). Descriptions are the queries' own banner "
           "comments; this table is script-emitted — edit the source, not "
           "the table.", "",
           "| Query | What it gates | File |", "|---|---|---|"]
    for name in sorted(rows, key=qnum):
        desc, fname = rows[name]
        desc = desc.replace("|", "\\|")
        out.append(f"| {name} | {desc} | {fname} |")
    out += ["", END]
    return "\n".join(out)


def check_hand_table(rows, text):
    """Fail when a harvested query has no mention in the hand-written part
    of §8 (everything between the '## 8.' heading and the GEN markers).
    Rows q01–q20 are parity gates indexed by the §2 tables above, so only
    beyond-parity queries (q21+) are required; a mention is any qNNN_
    or bare qNNN token in a hand-table row."""
    hand = text.split("## 8.", 1)[1].split(BEGIN, 1)[0]
    mentioned = set(re.findall(r"\bq(\d+)\b", hand))
    for lo, hi in re.findall(r"\bq(\d+)\s*[-–]\s*q(\d+)\b", hand):
        mentioned.update(str(n) for n in range(int(lo), int(hi) + 1))
    missing = [n for n in sorted(rows, key=qnum)
               if qnum(n) > 20 and str(qnum(n)) not in mentioned]
    if missing:
        sys.exit("SURVEY §8 hand table is missing rows for: "
                 + ", ".join(missing))


def main():
    rows = harvest()
    if not rows:
        sys.exit("no queries harvested — regex drift?")
    text = SURVEY.read_text()
    if BEGIN not in text or END not in text:
        sys.exit("GEN markers missing from SURVEY.md")
    check_hand_table(rows, text)
    pre, rest = text.split(BEGIN, 1)
    _, post = rest.split(END, 1)
    new = pre + render(rows) + post
    # refresh the §8 heading's query count
    new = re.sub(r"(## 8\. Implementation index \(maintained[^)]*?)\d+ oracle-backed queries",
                 rf"\g<1>{len(rows)} oracle-backed queries", new)
    if "--check" in sys.argv:
        if new != text:
            sys.exit("SURVEY.md query index is stale — run scripts/gen_survey_index.py")
        print(f"index current ({len(rows)} queries)")
        return
    SURVEY.write_text(new)
    print(f"wrote {len(rows)} query rows into SURVEY.md")


if __name__ == "__main__":
    main()
