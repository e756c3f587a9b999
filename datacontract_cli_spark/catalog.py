"""Static HTML catalog over a set of contract files.

Reference behavior: datacontract/command_catalog.py + catalog/catalog.py —
glob the contract YAMLs (recursively), render one HTML page per contract
(the html exporter), write an index page linking them; unparseable files
are skipped with a message, not fatal.
"""

from __future__ import annotations

import html as _html
from pathlib import Path
from typing import List, Optional, Tuple

from datacontract_cli_spark.export_docs import to_html
from datacontract_cli_spark.model.contract import DataContract, load_contract

_INDEX_PAGE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>Data Contract Catalog</title>
<style>
body {{ font-family: -apple-system, 'Segoe UI', Roboto, sans-serif; margin: 2rem auto; max-width: 64rem; color: #1f2430; }}
table {{ border-collapse: collapse; width: 100%; }}
th, td {{ border: 1px solid #dadfe8; padding: .4rem .7rem; text-align: left; }}
th {{ background: #f3f5f9; }}
a {{ color: #2743c8; text-decoration: none; }}
</style>
</head>
<body>
<h1>Data Contract Catalog</h1>
<p>{count} data contract(s)</p>
<table>
<thead><tr><th>Contract</th><th>Id</th><th>Version</th><th>Models</th><th>Owner</th></tr></thead>
<tbody>{rows}</tbody>
</table>
</body>
</html>
"""


def _page_name(source: Path, base: Path) -> str:
    """Page name from the RELATIVE path (separators -> '__') so two
    contracts that share a filename in different directories (the common
    one-datacontract.yaml-per-folder layout) get distinct pages instead of
    silently overwriting each other."""
    try:
        rel = source.relative_to(base)
    except ValueError:
        rel = source
    stem = "__".join(list(rel.parts[:-1]) + [rel.stem])
    return stem + ".html"


def build_catalog(files: str = "*.yaml", output: str = "catalog/",
                  root: Optional[str] = None) -> List[Tuple[Path, DataContract]]:
    """Render the catalog; returns the (source file, contract) pairs that
    made it in. Broken contracts are skipped with a printed note."""
    out = Path(output)
    out.mkdir(parents=True, exist_ok=True)
    base = Path(root) if root else Path()
    entries: List[Tuple[Path, DataContract]] = []
    for source in sorted(base.rglob(files)):
        if Path(output) in source.parents:
            continue
        try:
            contract = load_contract(str(source))
        except Exception as e:  # unparseable file: skip, don't die
            print(f"Skipped {source} due to error: {e}")
            continue
        page = _page_name(source, base)
        (out / page).write_text(to_html(contract), encoding="utf-8")
        entries.append((source, contract))
        print(f"Created {out / page}")
    rows = "".join(
        f'<tr><td><a href="{_html.escape(_page_name(src, base))}">'
        f"{_html.escape(c.name or c.id or src.stem)}</a></td>"
        f"<td>{_html.escape(c.id or '')}</td>"
        f"<td>{_html.escape(c.version or '')}</td>"
        f"<td>{_html.escape(', '.join(o.name for o in c.schema_objects))}</td>"
        f"<td>{_html.escape(c.owner or '')}</td></tr>"
        for src, c in entries)
    (out / "index.html").write_text(
        _INDEX_PAGE.format(count=len(entries), rows=rows), encoding="utf-8")
    print(f"Created {out / 'index.html'}")
    return entries
