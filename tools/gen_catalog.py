"""Generate QUERIES.md — an auto-built index of every registered query:
name, tags, oracle kind, and the first docstring sentence. Regenerate
with: python tools/gen_catalog.py (run after adding queries)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    for stop in (". ", " — the", ".\n"):
        i = text.find(stop)
        if 0 < i < 240:
            return text[: i + 1]
    return text[:240]


def main() -> int:
    import osmart_etl_spark.queries  # noqa: F401
    from osmart_etl_spark.queries.base import REGISTRY

    lines = [
        "# Query catalog (auto-generated — `python tools/gen_catalog.py`)",
        "",
        f"{len(REGISTRY)} registered queries; every one carries a DuckDB",
        "oracle and is hash-compared by the driver at sf0.01",
        "(`tools/check_parity.py` runs the same gate locally).",
        "",
        "| query | tags | summary |",
        "|---|---|---|",
    ]
    for name in sorted(REGISTRY):
        qd = REGISTRY[name]
        mod = qd.fn.__module__.rsplit(".", 1)[-1]
        tags = " ".join(qd.tags) or "-"
        summ = first_sentence(qd.fn.__doc__).replace("|", "\\|")
        lines.append(f"| `{name}` ({mod}) | {tags} | {summ} |")
    out = os.path.join(os.path.dirname(__file__), "..", "QUERIES.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(REGISTRY)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
