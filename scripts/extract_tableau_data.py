#!/usr/bin/env python
"""Extract published high-order Runge-Kutta coefficient sets into our JSON
data schema.

The numeric values are public mathematical constants from the cited papers
(Feagin 2007+, Ono 2003, Stepanov arXiv:2504.17329, Zhang arXiv:1911.00318,
Cooper & Verner 1972, Ruuth 2006, Biswas et al. arXiv:2310.02817, Shanks
1965 ...); we read them via the reference implementation's composed tableaux
rather than re-keying hundreds of 60-digit constants by hand.

Schema per method: {"c": [...], "a": [[...], ...], "b": [...], "b_err": [...]?}

Run:  python scripts/extract_tableau_data.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/reference")

from skrample.sampling import tableaux as r_tab  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "skrample_tpu" / "sampling" / "tableaux" / "data"


def encode(tableau) -> dict:
    entry: dict = {
        "c": [s.c for s in tableau.stages],
        "a": [list(s.a) for s in tableau.stages],
        "b": list(tableau.weights),
    }
    if isinstance(tableau, r_tab.EmbeddedTableau):
        entry["b_err"] = list(tableau.error_weights)
    return entry


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)

    groups: dict[str, dict[str, dict]] = {
        "rkz": {member.name: encode(member.value) for member in r_tab.RKZ},
        "ssp": {member.name: encode(member.value) for member in r_tab.SSP},
        "wso": {member.name: encode(member.value) for member in r_tab.WSO},
        "shanks1965": {member.name: encode(member.value) for member in r_tab.Shanks1965},
    }
    for name, data in groups.items():
        path = OUT / f"{name}.json"
        path.write_text(json.dumps(data, indent=0))
        print(f"wrote {path} ({len(data)} methods)")


if __name__ == "__main__":
    main()
