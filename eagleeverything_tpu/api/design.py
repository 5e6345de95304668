"""Fixed-effects design-matrix construction from a formula string.

Reference: the internal ``constructX``-style builder that expands
``fformula`` over phenotype columns plus one column per selected marker
(SURVEY.md §3.2). The rebuild supports the same surface: a right-hand-side
formula over phenotype column names, e.g. ``"age + sex"``; numeric columns
enter as-is, string/factor columns are dummy-coded dropping the first
level; an intercept is always included.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def build_design(
    pheno: dict[str, np.ndarray],
    fformula: Optional[str],
    n: int,
) -> tuple[np.ndarray, list[str]]:
    """Build (X, column_names) from the phenotype table and formula RHS."""
    cols: list[np.ndarray] = [np.ones(n)]
    names: list[str] = ["(Intercept)"]
    if fformula:
        rhs = fformula.split("~")[-1].strip()
        terms = [t.strip() for t in rhs.split("+") if t.strip() and t.strip() != "1"]
        for term in terms:
            if term not in pheno:
                raise KeyError(
                    f"formula term {term!r} is not a phenotype column; "
                    f"available: {sorted(pheno)}"
                )
            col = pheno[term]
            if np.issubdtype(np.asarray(col).dtype, np.number):
                cols.append(np.asarray(col, dtype=np.float64))
                names.append(term)
            else:
                levels = sorted(set(str(v) for v in col))
                for lev in levels[1:]:  # drop first level (baseline)
                    cols.append((np.asarray(col).astype(str) == lev).astype(np.float64))
                    names.append(f"{term}{lev}")
    X = np.column_stack(cols)
    return X, names


def na_rows(*arrays: np.ndarray) -> np.ndarray:
    """Indices of records with any missing value across the given columns
    (reference: the ``indxNA`` bookkeeping in ``AM()``, SURVEY.md §3.2)."""
    n = len(arrays[0])
    bad = np.zeros(n, dtype=bool)
    for a in arrays:
        a = np.asarray(a)
        if np.issubdtype(a.dtype, np.number):
            bad |= ~np.isfinite(a.astype(np.float64))
        else:
            s = a.astype(str)
            bad |= (s == "NA") | (s == "nan") | (s == "")
    return np.where(bad)[0]
