"""Static co-occurrence count tables (S4): the CDW file-reader mode.

Re-expression of `builder/cdw.py:37-62` (``read_icd9``): two delimited files
— a marginal table ``code|count`` (AllDxCounts.txt shape) and a symmetric
pair table ``code_a|code_b|count`` (ICD_Combo_Chi2.txt shape) — parsed into
dicts with BOTH pair orientations stored (`builder/cdw.py:53-62`), plus the
population size N (`builder/cdw.py:16`: total=269332 analog).

These dicts are reference data (small side): broadcast once via ``ray.put``
and consumed by the ``static_counts`` supporter (stages.supporters), which
scores candidate pairs with left-outer semantics (`builder/cdw.py:92-100`
J4): pair present -> real counts + chi2; pair absent -> suppressed row with
``expected = c1*c2/N`` only (the ``c='<11'`` fallback, modeled as
c=0/suppressed=true per SURVEY §7.4.6).
"""

from __future__ import annotations

import os

from ..functions.text import pair_key


def read_count_tables(
    marginal_path: str, pair_path: str, total: int, sep: str = "|"
) -> dict:
    """-> {"total": N, "marginals": {code: n}, "pairs": {(a,b): n}} with the
    pair dict keyed on the canonical (min, max) orientation."""
    marginals: dict[str, int] = {}
    with open(marginal_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            code, n = line.split(sep)
            marginals[code.strip()] = int(n)
    pairs: dict[tuple[str, str], int] = {}
    with open(pair_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            a, b, n = line.split(sep)
            pairs[pair_key(a.strip(), b.strip())] = int(n)
    return {"total": total, "marginals": marginals, "pairs": pairs}


def write_count_tables(counts: dict, out_dir: str, sep: str = "|") -> dict:
    """Inverse of read_count_tables (fixture/export helper)."""
    os.makedirs(out_dir, exist_ok=True)
    mp = os.path.join(out_dir, "marginals.txt")
    pp = os.path.join(out_dir, "pairs.txt")
    with open(mp, "w") as f:
        for code in sorted(counts["marginals"]):
            f.write(f"{code}{sep}{counts['marginals'][code]}\n")
    with open(pp, "w") as f:
        for (a, b) in sorted(counts["pairs"]):
            f.write(f"{a}{sep}{b}{sep}{counts['pairs'][(a, b)]}\n")
    return {"marginal_path": mp, "pair_path": pp}
