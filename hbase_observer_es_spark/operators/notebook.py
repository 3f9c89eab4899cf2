"""Jupyter notebooks → per-cell training rows, stdlib-only (json).

Code corpora scraped from GitHub are full of ``.ipynb`` files — JSON in
the public nbformat layout. Feeding the raw JSON to a tokenizer wastes
most of the budget on protocol keys and base64 output blobs; the
training signal is the CELLS. This extractor walks nbformat 4 (and the
3.x ``worksheets`` layout) into one typed row per cell:

* ``cell_type`` (code / markdown / raw), the SOURCE joined exactly as
  nbformat defines (list-of-lines keeps its embedded newlines; plain
  string passes through);
* code cells carry ``execution_count`` (−1 when null) and the count of
  outputs — outputs themselves are DROPPED (base64 images and traceback
  noise are not language-model food; the count survives so a "has the
  code ever run" filter stays possible);
* the notebook language from metadata (kernelspec or language_info),
  empty when absent;
* strict and loud: non-JSON, a JSON payload that is not a notebook
  (no ``cells``/``worksheets``), or a cell without the mandatory fields
  names the document and cell index.

``notebook_cells_frame`` is the Spark fan-out: one document → one row
per cell, ordered by ``cell_idx`` — ready for the markdown extractor
(markdown cells) and the code-corpus filters (code cells) downstream.

Reference parity: none — builder-brief text surface (SURVEY §2-D's
corpus family).
"""

from __future__ import annotations

import json

NOTEBOOK_CELL_SCHEMA = (
    "cell_idx long, cell_type string, source string, language string,"
    " execution_count long, n_outputs long"
)


def _join_source(src, origin: str, idx: int) -> str:
    if isinstance(src, str):
        return src
    if isinstance(src, list) and all(isinstance(x, str) for x in src):
        return "".join(src)
    raise ValueError(
        f"notebook {origin}: cell {idx} source is "
        f"{type(src).__name__}, not str or list of str"
    )


def notebook_cells(text: str, origin: str = "<text>") -> list:
    """One .ipynb document → [{"cell_idx", "cell_type", "source",
    "language", "execution_count", "n_outputs"}, ...]."""
    try:
        nb = json.loads(text)
    except json.JSONDecodeError as exc:
        raise ValueError(f"notebook {origin}: not JSON ({exc})") from exc
    if not isinstance(nb, dict):
        raise ValueError(
            f"notebook {origin}: top level is {type(nb).__name__}, not an object"
        )
    meta = nb.get("metadata") or {}
    language = ""
    if isinstance(meta, dict):
        ks = meta.get("kernelspec") or {}
        li = meta.get("language_info") or {}
        language = (
            (li.get("name") if isinstance(li, dict) else "")
            or (ks.get("language") if isinstance(ks, dict) else "")
            or ""
        )
    if "cells" in nb:
        raw_cells = nb["cells"]
    elif "worksheets" in nb:  # nbformat 3
        raw_cells = [
            c
            for ws in nb["worksheets"]
            if isinstance(ws, dict)
            for c in ws.get("cells", [])
        ]
    else:
        raise ValueError(
            f"notebook {origin}: JSON carries neither 'cells' nor "
            "'worksheets' — not a notebook"
        )
    if not isinstance(raw_cells, list):
        raise ValueError(f"notebook {origin}: cells is not a list")
    rows = []
    for idx, cell in enumerate(raw_cells):
        if not isinstance(cell, dict) or "cell_type" not in cell:
            raise ValueError(
                f"notebook {origin}: cell {idx} lacks cell_type"
            )
        ctype = cell["cell_type"]
        # nbformat 3 code cells store source under "input"
        src = cell.get("source", cell.get("input"))
        if src is None:
            raise ValueError(f"notebook {origin}: cell {idx} has no source")
        exec_count = cell.get("execution_count", cell.get("prompt_number"))
        outputs = cell.get("outputs") or []
        rows.append(
            {
                "cell_idx": idx,
                "cell_type": ctype,
                "source": _join_source(src, origin, idx),
                "language": language,
                "execution_count": exec_count if isinstance(exec_count, int) else -1,
                "n_outputs": len(outputs) if isinstance(outputs, list) else 0,
            }
        )
    return rows


def notebook_cells_frame(df, text_col: str = "text", id_col: str = "doc_id"):
    """One notebook document → one row per cell via mapInPandas; parse
    failures name the doc."""
    import pandas as pd

    def extract(batches):
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    id_col, "cell_idx", "cell_type", "source", "language",
                    "execution_count", "n_outputs",
                )
            }
            for key, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    raise ValueError(
                        f"notebook {key}: text column is NULL — not a "
                        "parseable document"
                    )
                for cell in notebook_cells(text, origin=str(key)):
                    rows[id_col].append(key)
                    for k, v in cell.items():
                        rows[k].append(v)
            yield pd.DataFrame(rows)

    return df.mapInPandas(extract, f"{id_col} long, {NOTEBOOK_CELL_SCHEMA}")
