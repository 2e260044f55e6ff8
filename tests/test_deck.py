import glob
import os

import pytest

from aither_tpu.io.deck import parse_deck

CASES = "/root/reference/testCases"


@pytest.mark.skipif(not os.path.isdir(CASES), reason="reference cases absent")
def test_parse_all_reference_decks():
    decks = sorted(glob.glob(os.path.join(CASES, "*", "*.inp")))
    assert len(decks) >= 15
    for path in decks:
        deck = parse_deck(path).finalize()
        assert deck["gridName"]
        assert deck.num_equations >= 5
        assert len(deck.bcs) >= 1
        for blk in deck.bcs:
            assert len(blk.surfaces) == blk.num_i + blk.num_j + blk.num_k


def test_shocktube_values():
    deck = parse_deck(os.path.join(CASES, "shockTube", "shockTube.inp"))
    deck.finalize()
    assert deck["timeIntegration"] == "bdf2"
    assert deck["nonlinearIterations"] == 5
    assert deck["timeStep"] == pytest.approx(4.868e-6)
    assert deck["faceReconstruction"] == "weno"
    assert deck.num_ghosts == 3
    assert deck.num_equations == 5
    assert len(deck.ics) == 2
    ic1 = deck.ic_for_block(1)
    assert ic1["pressure"] == pytest.approx(10132.5)
    assert ic1["velocity"] == [0, 0, 0]
    # reference speed of sound for air at 288.15K, cpg gamma=1.4
    import math
    r = 8.3144598 / 0.02897
    assert deck.a_ref == pytest.approx(math.sqrt(1.4 * r * 288.15), rel=1e-10)
    # bcs: 2 blocks, 6 surfaces each
    assert len(deck.bcs) == 2
    s = deck.bcs[0].surfaces[4]
    assert s.bc_type == "interblock" and s.direction == "k" and s.tag == 5001
    assert not s.is_lower


def test_rae2822_deck():
    deck = parse_deck(os.path.join(CASES, "rae2822", "rae2822.inp")).finalize()
    assert deck.is_rans
    assert deck.num_equations == 7
    assert deck.is_implicit
    assert deck.is_viscous
    assert len(deck.bc_states) >= 1


def test_unknown_key_rejected():
    """Unknown keys fail loudly (reference: input.cpp:111-155 vars_
    registry rejection)."""
    from aither_tpu.io.deck import parse_deck_text
    with pytest.raises(ValueError, match="unknown input deck key"):
        parse_deck_text("gridNam: typo\n")
    with pytest.raises(ValueError, match="not recognized"):
        parse_deck_text("limiter: superbee\n")


def test_turbulence_model_consistency():
    """reference: input.cpp:963-985 CheckTurbulenceModel."""
    from aither_tpu.io.deck import parse_deck_text
    base = ("gridName: g\nreferenceDensity: 1.0\n"
            "referenceTemperature: 300.0\n")
    with pytest.raises(ValueError, match="must.*specify turbulence model"):
        parse_deck_text(base + "equationSet: rans\n").finalize()
    with pytest.raises(ValueError, match="only valid for the RANS"):
        parse_deck_text(base + "equationSet: euler\n"
                        "turbulenceModel: sst2003\n").finalize()
    with pytest.raises(ValueError, match="RANS, but turbulence model"):
        parse_deck_text(base + "equationSet: rans\n"
                        "turbulenceModel: wale\n").finalize()
    with pytest.raises(ValueError, match="LES, but turbulence model"):
        parse_deck_text(base + "equationSet: largeEddySimulation\n"
                        "turbulenceModel: sst2003\n").finalize()


def test_output_variable_pruning():
    """RANS/turbulent/viscous-only variables are pruned with a warning
    (reference: input.cpp:894-960)."""
    from aither_tpu.io.deck import parse_deck_text
    deck = parse_deck_text(
        "gridName: g\nreferenceDensity: 1.0\n"
        "referenceTemperature: 300.0\nequationSet: euler\n"
        "outputVariables: <density, tke, viscosity, turbulentViscosity,\n"
        "                  pressure, mf_unknownSpecies>\n").finalize()
    assert deck.output_variables == ["density", "pressure"]
