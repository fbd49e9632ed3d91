"""Butcher tableau value types and the coefficient builder.

Tableaux are *data*: hashable NamedTuples of Python floats.  The RK engine
(:func:`skrample_tpu.sampling.functional.step_tableau`) unrolls their stages
at JAX trace time, so nothing here ever touches a device.

Reference parity: Beinsezii/skrample ``skrample/sampling/tableaux/common.py``.
"""

from __future__ import annotations

import dataclasses
import math
from collections.abc import MutableSequence, Sequence
from typing import NamedTuple, Self


class Stage(NamedTuple):
    "One RK stage: node fraction ``c`` and its row of ``a`` coefficients."

    c: float
    a: tuple[float, ...]


class Tableau(NamedTuple):
    stages: tuple[Stage, ...]
    weights: tuple[float, ...]


class EmbeddedTableau(NamedTuple):
    "A tableau with a second (lower-order) weight row for error estimation."

    stages: tuple[Stage, ...]
    weights: tuple[float, ...]
    error_weights: tuple[float, ...]

    def unembed(self) -> Tableau:
        return Tableau(self.stages, self.weights)


type TableauType = Tableau | EmbeddedTableau


@dataclasses.dataclass(frozen=True)
class ButcherCoeffs:
    """Mutable-content builder for assembling tableaux from raw coefficient
    streams, Shu-Osher form, or decomposed existing tableaux."""

    one_index: bool
    c: MutableSequence[float]
    a: Sequence[MutableSequence[float]]
    b: MutableSequence[float]

    @classmethod
    def empty(cls, stages: int, fill: float = -math.inf, one_index: bool = False) -> Self:
        count = stages + one_index
        c = [fill] * count
        a = [[fill] * n for n in range(count)]
        b = [fill] * count
        c[one_index] = 0  # the first explicit stage is always at c=0
        return cls(one_index, c=c, a=a, b=b)

    def compute_c(self) -> None:
        "Derive the node fractions as row sums of ``a`` (the standard convention)."
        self.c[:] = [math.fsum(row) for row in self.a]

    def compose(self) -> Tableau:
        start = self.one_index
        return Tableau(
            tuple(Stage(c, tuple(a[start:])) for c, a in zip(self.c[start:], self.a[start:], strict=True)),
            tuple(self.b[start:]),
        )

    @classmethod
    def decompose(cls, tableau: Tableau) -> Self:
        return cls(
            False,
            c=[s.c for s in tableau.stages],
            a=[list(s.a) for s in tableau.stages],
            b=list(tableau.weights),
        )

    @classmethod
    def deserialize(cls, coeffs: list[float], stages: int, compute_c: bool = False, b_last: bool = True) -> Self:
        """Fill from a flat coefficient stream.

        Layout: optional c block, optional leading b block (``b_last=False``),
        the strictly-lower-triangular a matrix row by row, optional trailing
        b block (``b_last=True``)."""
        t = cls.empty(stages)
        expected = len(t.c) * (not compute_c) + len(t.b) + sum(len(row) for row in t.a)
        assert len(coeffs) == expected, (len(coeffs), expected)

        stream = iter(coeffs)

        if not compute_c:
            for n in range(len(t.c)):
                t.c[n] = next(stream)

        if not b_last:
            for n in range(len(t.b)):
                t.b[n] = next(stream)

        for row in t.a[1:]:
            for y in range(len(row)):
                row[y] = next(stream)

        if compute_c:
            t.compute_c()

        if b_last:
            for n in range(len(t.b)):
                t.b[n] = next(stream)

        return t

    def serialize(self) -> Sequence[float]:
        return [*self.c, *(x for row in self.a for x in row), *self.b]

    @classmethod
    def from_shu_osher(cls, alphas: Sequence[Sequence[float]], betas: Sequence[Sequence[float]]) -> Self:
        """Convert Shu-Osher form (convex-combination alphas + betas, as used
        for SSP method tables) into standard Butcher form."""
        stages = len(alphas)
        t = cls.empty(stages)

        for i in range(1, stages):
            for j in range(i):
                # Resolve the recursion on previous stages into plain a[i][j]
                t.a[i][j] = math.fsum((betas[i - 1][j], *(alphas[i - 1][k] * t.a[k][j] for k in range(j + 1, i))))

        for j in range(stages):
            t.b[j] = math.fsum(
                (betas[stages - 1][j], *(alphas[stages - 1][k] * t.a[k][j] for k in range(j + 1, stages)))
            )

        t.compute_c()
        return t


def pretty_tableau(tableau: TableauType, label: str | None = None) -> str:
    "ASCII-render a tableau for debugging / docs."

    def fmt(x: float) -> str:
        return f"{'+' if x >= 0 else '-'}{float(round(abs(x), 4)): <6}"

    stage_lines = [f"{fmt(c)} | {' '.join(fmt(x) for x in a)}" for c, a in tableau[0]]
    weight_lines = ["        | " + " ".join(fmt(x) for x in w) for w in tableau[1:]]
    width = max(len(line) for line in (*weight_lines, *stage_lines))

    lines: list[str] = [label.rjust((width + len(label)) // 2)] if label is not None else []
    lines.extend((*stage_lines, "-" * width, *weight_lines))
    return "\n".join(lines)


def validate_tableau(tab: TableauType, tolerance: float = 1e-12) -> None | IndexError | ValueError:
    """Structural + consistency checks: triangular a, c == row sums,
    weights summing to 1.  Returns (not raises) the error for test harnesses."""
    for index, stage in enumerate(tab.stages):
        if index != len(stage.a):
            return IndexError(f"{index=}, row_len={len(stage.a)}, {stage=}")
        if tolerance < (err := abs(stage.c - math.fsum(stage.a))):
            return ValueError(f"{tolerance=}, c_mismatch={err}, {stage=}")

    for weight_row in tab[1:]:
        if len(tab.stages) != len(weight_row):
            return IndexError(f"stages={len(tab.stages)}, weights={len(weight_row)}")
        if tolerance < (err := abs(1 - math.fsum(weight_row))):
            return ValueError(f"{tolerance=}, weight_sum_err={err}, {weight_row=}")

    return None
