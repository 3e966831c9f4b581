"""Excel interchange shims (dev-mode; reference workflow parity).

The reference's manual-correction workflow is Excel-in/Excel-out
(reference: ner_config.py:212 reads the correction workbook;
ner_config_old.py:300-332 writes per-sheet results). In this engine Excel
is strictly an *edge* format for the human-in-the-loop correction
dimension — a small table that fits on the driver — so the shims go
through pandas on the driver by design and refuse large frames rather
than pretending to scale. Production interchange is parquet
(sources/catalog.py); these exist so a reference user's .xlsx round trip
keeps working.

No Excel engine (openpyxl/xlsxwriter) ships in this container, so the
READ path carries its own minimal parser: .xlsx is a zip of SpreadsheetML
parts, and the subset these workbooks use (one worksheet, shared/inline
strings, numbers) parses with stdlib ``zipfile`` + ``ElementTree`` —
see :func:`read_xlsx_rows`. pandas/openpyxl is preferred when importable
(full fidelity: dates, formula caches); the stdlib fallback makes the
reference's committed workbooks readable here. The WRITE path still
degrades to CSV with a warning when no engine is installed.
"""

from __future__ import annotations

import os
import re
import warnings
import zipfile
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_SSML = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(cell_ref: str) -> int:
    """'A'->0, 'B'->1, ... 'AA'->26 (base-26 over the letter prefix)."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _si_text(si: ET.Element) -> str:
    """Concatenate the <t> runs of a shared-string item (plain or rich)."""
    return "".join(t.text or "" for t in si.iter(_SSML + "t"))


def read_xlsx_rows(path: str, sheet: int = 0) -> list[list]:
    """Minimal read-only .xlsx parser (stdlib zip + XML; no openpyxl).

    Returns the sheet as a list of rows, each a dense list padded with
    ``None`` to the sheet's max width. Covers the SpreadsheetML subset
    pandas ``to_excel`` and the reference's committed workbooks emit:
    shared strings (``t="s"``, rich-text runs concatenated), inline
    strings (``t="inlineStr"``), literal strings (``t="str"``), booleans
    and numbers (int when the lexical form has no '.'/exponent). Formula
    cells yield their cached value. Used for the consensus parity tests
    against the reference's committed golden workbooks
    (reference: src/Ressources/20231101.xlsx et al.).
    """
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            shared = [
                _si_text(si)
                for si in ET.fromstring(z.read("xl/sharedStrings.xml")).iter(
                    _SSML + "si"
                )
            ]
        # numeric sort: lexicographic would put sheet10.xml before
        # sheet2.xml and silently return the wrong sheet for index >= 1
        sheets = sorted(
            (
                n
                for n in z.namelist()
                if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
            ),
            key=lambda n: int(re.search(r"sheet(\d+)\.xml$", n).group(1)),
        )
        root = ET.fromstring(z.read(sheets[sheet]))

    rows: list[dict[int, object]] = []
    width = 0
    for row_el in root.iter(_SSML + "row"):
        row: dict[int, object] = {}
        for c in row_el:
            ref = c.get("r")
            if ref is None:
                continue
            idx = _col_index(ref)
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                is_el = c.find(_SSML + "is")
                value: object = _si_text(is_el) if is_el is not None else None
            else:
                v = c.find(_SSML + "v")
                if v is None or v.text is None:
                    value = None
                elif ctype == "s":
                    value = shared[int(v.text)]
                elif ctype == "str":
                    value = v.text
                elif ctype == "b":
                    value = v.text == "1"
                elif any(ch in v.text for ch in ".eE"):
                    value = float(v.text)
                else:
                    value = int(v.text)
            if value is not None:
                row[idx] = value
                width = max(width, idx + 1)
        rows.append(row)
    return [[r.get(i) for i in range(width)] for r in rows]


def read_xlsx_records(path: str, sheet: int = 0) -> list[dict]:
    """Header-keyed dict rows from :func:`read_xlsx_rows` (header = first
    row; unnamed columns get ``_col{i}``)."""
    rows = read_xlsx_rows(path, sheet)
    if not rows:
        return []
    header = [
        str(h) if h is not None else f"_col{i}" for i, h in enumerate(rows[0])
    ]
    return [dict(zip(header, r)) for r in rows[1:]]

#: refuse driver-side materialization beyond this many rows
MAX_DRIVER_ROWS = 1_000_000


def _have_excel_engine() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        try:
            import xlsxwriter  # noqa: F401

            return True
        except ImportError:
            return False


def write_excel(df: DataFrame, path: str, sheet_name: str = "Sheet1") -> str:
    """Write a small DataFrame to .xlsx (reference: ner_config_old.py:
    300-332). Falls back to CSV at ``path + '.csv'`` when no Excel engine
    is installed; returns the path actually written."""
    n = df.count()
    if n > MAX_DRIVER_ROWS:
        raise ValueError(
            f"write_excel is a dev-mode driver-side sink ({n} rows > "
            f"{MAX_DRIVER_ROWS}); write parquet via the catalog instead"
        )
    pdf = df.toPandas()
    if _have_excel_engine():
        pdf.to_excel(path, sheet_name=sheet_name, index=False)  # pragma: no cover
        return path
    fallback = path + ".csv"
    warnings.warn(
        f"no Excel engine (openpyxl/xlsxwriter) installed; wrote CSV to {fallback}",
        stacklevel=2,
    )
    pdf.to_csv(fallback, index=False)
    return fallback


def read_excel_dim(spark: SparkSession, path: str) -> DataFrame:
    """Read a correction-style dimension workbook (reference:
    ner_config.py:212) into a Spark DataFrame. Accepts the CSV fallback
    written by :func:`write_excel` transparently."""
    if os.path.exists(path) and path.endswith(".csv"):
        pdf = pd.read_csv(path)
    elif os.path.exists(path + ".csv") and not os.path.exists(path):
        pdf = pd.read_csv(path + ".csv")
    elif _have_excel_engine():
        pdf = pd.read_excel(path)  # pragma: no cover
    else:
        pdf = pd.DataFrame(read_xlsx_records(path))
    return spark.createDataFrame(pdf)
