"""LaTeX table templating.

Capability parity with the reference's stashed `stash/Tabulate.py:20-27`:
a ``string.Template`` subclass whose placeholder delimiter is ``??``
instead of ``$`` (so LaTeX math-mode dollars pass through untouched),
plus a convenience builder that renders solver-result rows into a
``tabular`` fragment for ``\\input`` into a report.
"""
from __future__ import annotations

from string import Template
from typing import Mapping, Sequence


class LatexSafeTemplate(Template):
    """Template with '??' placeholders — LaTeX-safe (Tabulate.py:20-27)."""

    delimiter = "??"


def latex_table(rows: Sequence[Sequence], header: Sequence[str] = None,
                align: str = None, fmt: str = "{}") -> str:
    """Render rows (and an optional header) as a LaTeX ``tabular``
    fragment with the reference example's |c|...|c| + \\hline style."""
    ncol = len(rows[0]) if rows else (len(header) if header else 0)
    if align is None:
        align = "|" + "c|" * ncol
    lines = ["\\begin{tabular}{%s}" % align, "\\hline"]
    if header is not None:
        lines.append(" & ".join(str(h) for h in header) + " \\\\")
        lines.append("\\hline")
    for row in rows:
        cells = [fmt.format(c) if not isinstance(c, str) else c
                 for c in row]
        lines.append(" & ".join(cells) + " \\\\")
    lines.append("\\hline")
    lines.append("\\end{tabular}")
    return "\n".join(lines) + "\n"


def render_template(template_str: str,
                    values: Mapping[str, object]) -> str:
    """Substitute ``??name`` placeholders (reference usage pattern,
    Tabulate.py example)."""
    return LatexSafeTemplate(template_str).substitute(
        {k: str(v) for k, v in values.items()})
