"""Tableau system: validation of every builtin, uniqueness, preset stage
counts, parametric generator closed forms, and the Shu-Osher converter."""

import math

import numpy as np
import pytest

from skrample_tpu.sampling import functional, tableaux

ALL_PROVIDERS: list[tableaux.TableauProvider] = [
    *tableaux.BUILTIN_TABLEAUX,
    *tableaux.BUILTIN_EMBEDDED_TABLEAU,
    *tableaux.GRAVEYARD,
]


@pytest.mark.parametrize("provider", ALL_PROVIDERS, ids=str)
def test_validate(provider) -> None:
    if error := tableaux.validate_tableau(provider.tableau()):
        raise error


def tableau_distance(a: tableaux.Tableau, b: tableaux.Tableau) -> float:
    a_ser = np.asarray(tableaux.ButcherCoeffs.decompose(a).serialize())
    b_ser = np.asarray(tableaux.ButcherCoeffs.decompose(b).serialize())
    return abs(a_ser - b_ser).max().item()


@pytest.mark.parametrize("provider", ALL_PROVIDERS, ids=str)
def test_unique(provider) -> None:
    mine = provider.tableau()
    rest = [p.tableau() for p in ALL_PROVIDERS]
    rest.pop(rest.index(mine))
    for other in rest:
        if len(mine.stages) == len(other.stages):
            assert tableau_distance(mine, other) > 1e-2


@pytest.mark.parametrize(
    ("label", "stages", "provider"),
    [
        (label, k, v)
        for label, preset in (
            ("default", functional.DEFAULT_PROVIDERS),
            ("stable", functional.STABLE_PROVIDERS),
            ("default_embedded", functional.DEFAULT_EMBEDDED_PROVIDERS),
        )
        for k, v in preset.items()
    ],
)
def test_preset_stage_counts(label, stages, provider) -> None:
    assert stages == len(provider.tableau()[0])


@pytest.mark.parametrize(
    ("stages", "provider"), list(functional.STABLE_PROVIDERS.items())
)
def test_stable_disjoint_from_default(stages, provider) -> None:
    assert provider not in functional.DEFAULT_PROVIDERS.values()


def test_rk2_closed_form() -> None:
    ralston = tableaux.Tableau(
        (tableaux.Stage(0.0, ()), tableaux.Stage(2 / 3, (2 / 3,))),
        (1 / 4, 3 / 4),
    )
    assert tableau_distance(ralston, tableaux.rk2_tableau(2 / 3)) < 1e-20


def test_rk3_closed_form() -> None:
    wray = tableaux.Tableau(
        (
            tableaux.Stage(0.0, ()),
            tableaux.Stage(8 / 15, (8 / 15,)),
            tableaux.Stage(2 / 3, (1 / 4, 5 / 12)),
        ),
        (1 / 4, 0.0, 3 / 4),
    )
    assert tableau_distance(wray, tableaux.rk3_tableau(8 / 15, 2 / 3)) < 1e-15


def test_rk4_closed_form() -> None:
    eighth = tableaux.Tableau(
        (
            tableaux.Stage(0, ()),
            tableaux.Stage(1 / 3, (1 / 3,)),
            tableaux.Stage(2 / 3, (-1 / 3, 1)),
            tableaux.Stage(1, (1, -1, 1)),
        ),
        (1 / 8, 3 / 8, 3 / 8, 1 / 8),
    )
    assert tableau_distance(eighth, tableaux.rk4_tableau(1 / 3, 2 / 3)) < 1e-12


def test_ees25_closed_form() -> None:
    published = tableaux.Tableau(  # EES(2,5;1/10), arXiv:2507.21006 (8.4)
        (
            tableaux.Stage(0, ()),
            tableaux.Stage(1 / 3, (1 / 3,)),
            tableaux.Stage(5 / 6, (-5 / 48, 15 / 16)),
        ),
        (1 / 10, 1 / 2, 2 / 5),
    )
    assert tableau_distance(published, tableaux.ees25_tableau(1 / 10)) < 1e-15


def test_ees27_closed_form() -> None:
    V2 = math.sqrt(2)
    published = tableaux.Tableau(  # EES(2,7;(5-3sqrt2)/14), arXiv:2507.21006 (8.6)
        (
            tableaux.Stage(0, ()),
            tableaux.Stage(1 / 3 * (2 - V2), (1 / 3 * (2 - V2),)),
            tableaux.Stage(1 / 6 * (2 + V2), (1 / 24 * (-4 + V2), 1 / 8 * (4 + V2))),
            tableaux.Stage(
                1 / 6 * (4 + V2), (1 / 168 * (-176 + 145 * V2), 3 / 56 * (8 - 5 * V2), 3 / 7 * (3 - V2))
            ),
        ),
        (1 / 14 * (5 - 3 * V2), 1 / 14 * (3 + V2), 3 / 14 * (-1 + 2 * V2), 1 / 14 * (9 - 4 * V2)),
    )
    assert tableau_distance(published, tableaux.ees27_tableau(1 / 14 * (5 - 3 * V2))) < 1e-15


def test_shu_osher_conversion() -> None:
    "Ruuth (2006) SSP RK4_5 alpha/beta form must produce the known Butcher form."
    butcher = tableaux.ButcherCoeffs.from_shu_osher(
        [
            [1],
            [0.444370493651235, 0.555629506348765],
            [0.620101851488403, 0, 0.379898148511597],
            [0.178079954393132, 0, 0, 0.821920045606868],
            [0, 0, 0.517231671970585, 0.096059710526147, 0.386708617503269],
        ],
        [
            [0.391752226571890],
            [0, 0.368410593050371],
            [0, 0, 0.251891774271694],
            [0, 0, 0, 0.544974750228521],
            [0, 0, 0, 0.063692468666290, 0.226007483236906],
        ],
    ).compose()
    expected = tableaux.Tableau(
        (
            tableaux.Stage(0, ()),
            tableaux.Stage(0.391752226869254, (0.391752226869254,)),
            tableaux.Stage(0.586079689066902, (0.217669096357835, 0.368410592709067)),
            tableaux.Stage(0.474542363162481, (0.082692086683094, 0.139958502107426, 0.251891774371961)),
            tableaux.Stage(
                0.935010631095793,
                (0.067966283574048, 0.115034698453668, 0.207034898772937, 0.54497475029514),
            ),
        ),
        (0.146811876157876, 0.248482909391317, 0.104258830279481, 0.274438901048481, 0.226007483122845),
    )
    assert tableau_distance(expected, butcher) < 1e-8
    # And it matches the shipped catalog entry
    assert tableau_distance(tableaux.SSP.RK4_5.tableau(), butcher) < 1e-8


def test_serialize_roundtrip() -> None:
    original = tableaux.RKE5.DormandPrince.tableau().unembed()
    coeffs = tableaux.ButcherCoeffs.decompose(original)
    flat = list(coeffs.serialize())
    rebuilt = tableaux.ButcherCoeffs.deserialize(flat, len(original.stages)).compose()
    assert tableau_distance(original, rebuilt) == 0


def test_deserialize_compute_c() -> None:
    original = tableaux.RK4.Kutta.tableau()
    coeffs = tableaux.ButcherCoeffs.decompose(original)
    flat = [x for row in coeffs.a for x in row] + list(coeffs.b)
    rebuilt = tableaux.ButcherCoeffs.deserialize(flat, 4, compute_c=True).compose()
    assert tableau_distance(original, rebuilt) == 0


def test_pretty_renders() -> None:
    text = tableaux.pretty_tableau(tableaux.RK4.Kutta.tableau(), "RK4")
    assert "RK4" in text and "|" in text


def test_validate_catches_errors() -> None:
    bad_c = tableaux.Tableau((tableaux.Stage(0.5, ()),), (1,))
    assert isinstance(tableaux.validate_tableau(bad_c), ValueError)
    bad_weights = tableaux.Tableau((tableaux.Stage(0, ()),), (0.5,))
    assert isinstance(tableaux.validate_tableau(bad_weights), ValueError)
    bad_rows = tableaux.Tableau((tableaux.Stage(0, (1.0,)),), (1,))
    assert isinstance(tableaux.validate_tableau(bad_rows), IndexError)
