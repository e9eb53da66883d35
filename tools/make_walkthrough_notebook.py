"""Build the executed example notebook from the walkthrough script.

The repo's notebook-parity artifact (the reference ships
docs/example_starred_notebooks/example_roi_modelling.ipynb; here the
single source of truth is docs/examples/roi_modelling_walkthrough.py,
which stays runnable/testable as a plain script).  This tool splits the
script on ``# %%`` cell markers, executes the cells sequentially in one
namespace capturing their stdout, appends a light-curve plot cell with
the figure embedded, and writes the executed .ipynb next to the script.

Run:  python tools/make_walkthrough_notebook.py
"""

import base64
import contextlib
import io
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
SCRIPT = REPO / "docs" / "examples" / "roi_modelling_walkthrough.py"
OUT = SCRIPT.with_suffix(".ipynb")

PLOT_CELL = '''\
# %% Plot the recovered light curves ----------------------------------------
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, ax = plt.subplots(figsize=(8, 4))
for i, label in enumerate("AB"[:M]):
    ax.errorbar(mjds, curves[f"{label}_flux"],
                yerr=curves[f"{label}_d_flux"], fmt="o", ms=4,
                label=f"source {label} (recovered)")
    ax.plot(mjds, scale * true_a[:, i], "k--", lw=0.8,
            label=f"source {label} (injected)" if i == 0 else None)
ax.set_xlabel("MJD")
ax.set_ylabel("flux [e-/s]")
ax.legend()
fig.tight_layout()
'''


def split_cells(source):
    """(kind, text) cells: module docstring -> markdown, # %% -> code."""
    cells = []
    m = re.match(r'\s*(?:"""|\'\'\')(.*?)(?:"""|\'\'\')\s*', source,
                 re.DOTALL)
    body = source
    if m:
        cells.append(("markdown", m.group(1).strip()))
        body = source[m.end():]
    chunks = re.split(r"^# %% ?(.*)$", body, flags=re.MULTILINE)
    # chunks = [pre, title1, code1, title2, code2, ...]
    pre = chunks[0].strip()
    if pre:
        cells.append(("code", pre))
    for title, code in zip(chunks[1::2], chunks[2::2]):
        title = title.strip().rstrip("-").strip()
        if title:
            cells.append(("markdown", f"## {title}"))
        code = code.strip()
        if code:
            cells.append(("code", code))
    return cells


def run_code_cell(code, namespace):
    """Execute one cell; return notebook-format outputs."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        exec(compile(code, str(SCRIPT), "exec"), namespace)  # noqa: S102
    outputs = []
    text = buf.getvalue()
    if text:
        outputs.append({"output_type": "stream", "name": "stdout",
                        "text": text.splitlines(keepends=True)})
    fig = namespace.get("fig")
    if fig is not None and "plt.subplots" in code:
        png = io.BytesIO()
        fig.savefig(png, format="png", dpi=110)
        outputs.append({
            "output_type": "display_data",
            "data": {"image/png":
                     base64.b64encode(png.getvalue()).decode()},
            "metadata": {},
        })
    return outputs


def main():
    source = SCRIPT.read_text()
    cells = split_cells(source)
    cells.append(("code", "\n".join(
        PLOT_CELL.splitlines()[1:])))  # strip its own # %% marker

    namespace = {"__name__": "__main__"}
    nb_cells = []
    count = 0
    for kind, text in cells:
        if kind == "markdown":
            nb_cells.append({"cell_type": "markdown", "metadata": {},
                             "source": text.splitlines(keepends=True)})
            continue
        count += 1
        outputs = run_code_cell(text, namespace)
        nb_cells.append({
            "cell_type": "code", "execution_count": count,
            "metadata": {}, "outputs": outputs,
            "source": text.splitlines(keepends=True),
        })
    nb = {
        "cells": nb_cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3",
                           "language": "python", "name": "python3"},
            "language_info": {"name": "python"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    OUT.write_text(json.dumps(nb, indent=1))
    print(f"wrote {OUT} ({count} executed code cells)")


if __name__ == "__main__":
    main()
