"""R `check.names=TRUE`-compatible column-name mangling.

The reference reads NHS CSVs with ``fread(..., check.names=T)``
(`1b. Scrape links ... .R:373`) which turns `Gt 00 To 01 Weeks SUM 1`
into `Gt.00.To.01.Weeks.SUM.1`. Golden outputs depend on these names,
so the engine reproduces the transform at the CSV edge (SURVEY.md §7.5).

R's make.names rules: every character that is not alphanumeric or '.'
or '_' becomes '.', names starting with a digit (or '.' followed by a
digit) get an 'X' prefix, and duplicates get '.1', '.2', ... suffixes
(make.unique semantics).
"""

from __future__ import annotations

import re


def _make_name(name: str) -> str:
    out = re.sub(r"[^0-9A-Za-z._]", ".", name)
    if out == "" or re.match(r"^[0-9]", out) or re.match(r"^\.[0-9]", out):
        out = "X" + out
    return out


def check_names(names: list[str]) -> list[str]:
    """Mangle then uniquify a header list exactly like
    ``check.names=TRUE`` (make.names + make.unique)."""
    mangled = [_make_name(n) for n in names]
    seen: dict[str, int] = {}
    out: list[str] = []
    for n in mangled:
        if n not in seen:
            seen[n] = 0
            out.append(n)
        else:
            seen[n] += 1
            candidate = f"{n}.{seen[n]}"
            while candidate in seen:
                seen[n] += 1
                candidate = f"{n}.{seen[n]}"
            seen[candidate] = 0
            out.append(candidate)
    return out
