"""GALFIT feedme importer (io/galfit.py).

Parses the reference's real GALFIT input (reference tests/sim.feedme)
plus synthetic feedme text covering every importable object type and
the hidden shape parameters; asserts the documented convention
conversions (position -1, angle +90, expdisk scale length ->
half-light radius, FWHM -> reff, q -> semi-minor sizes) and the EXACT
surface-brightness -> total-magnitude conversion for GALFIT's
SB-parameterized families (king / nuker / edgedisk).
"""
import os

import numpy as np
import pytest

from psfmc_tpu import distributions as D
from psfmc_tpu.io.galfit import (
    _sb_factor_ferrer,
    _sb_factor_king,
    _sb_factor_nuker,
    components_from_feedme,
    feedme_to_model_source,
    parse_feedme,
    results_to_feedme,
)
from psfmc_tpu.models.components import (
    DeVaucouleurs,
    EdgeDisk,
    ExpDisk,
    Ferrer,
    Gaussian,
    King,
    Moffat,
    PointSource,
    Sersic,
    Sky,
)

HEADER = """
A) obs.fits
J) 26.0               # zeropoint
K) 0.05 0.05          # plate scale
P) 0
"""


def test_parse_reference_feedme(reference_dir):
    path = os.path.join(reference_dir, "tests", "sim.feedme")
    if not os.path.exists(path):
        pytest.skip("sim.feedme missing")
    model = parse_feedme(path)
    assert model.mag_zeropoint == pytest.approx(26.2303)
    assert model.plate_scale == pytest.approx((0.06, 0.06))
    # the commented-out '#D) psf.fits' entry must NOT be picked up
    assert "D" not in model.header
    (obj,) = model.objects
    assert obj.kind == "sersic"
    assert obj.params["1"] == ([64.5, 64.5], [1, 1])
    assert obj.params["4"] == ([6.3], [1])


def test_import_reference_feedme(reference_dir):
    path = os.path.join(reference_dir, "tests", "sim.feedme")
    if not os.path.exists(path):
        pytest.skip("sim.feedme missing")
    (comp,) = components_from_feedme(path)
    assert isinstance(comp, Sersic)
    assert comp.angle_degrees is True
    # every toggled parameter became a Uniform prior centered on the
    # GALFIT value with the documented conversions applied
    xy = comp._priors["xy"]
    assert isinstance(xy, D.Uniform)
    np.testing.assert_allclose(xy.rv_frozen.mean(), [63.5, 63.5])
    assert comp._priors["reff"].rv_frozen.median() == pytest.approx(
        6.3 * (3.0 + 1.0 / 3.0) / 2.0
    )  # Uniform over [v/3, 3v]
    assert comp._priors["index"].rv_frozen.support()[0] == pytest.approx(
        3.25
    )
    # psfMC angle = GALFIT angle + 90 (reference sim.feedme:1)
    lo, hi = comp._priors["angle"].rv_frozen.support()
    assert 0.5 * (lo + hi) == pytest.approx(25.35 + 90.0)
    # axis ratio folds into the semi-minor radius
    lo_b, hi_b = comp._priors["reff_b"].rv_frozen.support()
    assert hi_b == pytest.approx(0.82 * 6.3 * 3.0)

    # priors='fixed' imports plain constants
    (const,) = components_from_feedme(path, priors="fixed")
    assert isinstance(const.reff, float) and const.reff == 6.3
    np.testing.assert_allclose(const.xy, [63.5, 63.5])
    assert const.angle == pytest.approx(115.35)


FEEDME_MULTI = HEADER + """
# Object 1
 0) sky
 1) 12.5  0      # sky value
 2) 0.01  1      # dsky/dx
 3) 0.0   0      # dsky/dy

 0) psf
 1) 30.0 40.0 1 1
 3) 19.5 1

 0) expdisk
 1) 65.0 66.0 0 0
 3) 20.0 0
 4) 4.0  0       # scale length Rs
 9) 0.5  0
10) 10.0 0

 0) gaussian
 1) 65.0 65.0 0 0
 3) 22.0 0
 4) 6.0  0       # FWHM
 9) 1.0  0
10) 0.0  0

 0) moffat
 1) 65.0 65.0 0 0
 3) 21.0 1
 4) 3.0  1       # FWHM
 5) 2.5  0       # beta
 9) 0.9  0
10) 5.0  0

 0) devauc
 1) 60.0 60.0 0 0
 3) 18.0 0
 4) 10.0 0
 9) 0.7  0
10) 0.0  0
C0) 0.3  1
F1) 0.05 30.0 1 1
B2) 0.02 1
R0) power
R1) 2.0  0
R2) 12.0 0
R3) 120.0 1
R4) 0.5  0

 0) ferrer
 1) 50.0 50.0 0 0
 3) 19.0 0
 4) 8.0  0
 5) 2.0  0
 6) 1.0  0
 9) 0.8  0
10) 0.0  0
"""


def test_import_all_types():
    comps = components_from_feedme(FEEDME_MULTI)
    sky, ps, disk, gauss, mof, dev, fer = comps
    assert isinstance(sky, Sky)
    assert sky.adu == 12.5  # toggle 0 -> constant
    assert isinstance(sky._priors["dx"], D.Uniform)  # toggle 1 -> prior
    assert not sky._has("dy")  # zero + fixed: omitted entirely

    assert isinstance(ps, PointSource)
    np.testing.assert_allclose(
        ps._priors["xy"].rv_frozen.mean(), [29.0, 39.0]
    )
    assert isinstance(ps._priors["mag"], D.Uniform)

    assert isinstance(disk, ExpDisk)
    # scale length -> half-light radius: reff = kappa(n=1) * Rs
    assert disk.reff == pytest.approx(1.6783469900166605 * 4.0)
    assert disk.reff_b == pytest.approx(0.5 * disk.reff)
    assert disk.angle == pytest.approx(100.0)

    assert isinstance(gauss, Gaussian)
    assert gauss.reff == pytest.approx(3.0)  # FWHM/2

    assert isinstance(mof, Moffat)
    assert isinstance(mof._priors["fwhm"], D.Uniform)
    # q fixed but major-axis free: the minor axis must be free too
    assert isinstance(mof._priors["fwhm_b"], D.Uniform)
    assert mof.index == 2.5

    assert isinstance(dev, DeVaucouleurs)
    for attr in ("c0", "f1", "f1_phi", "b2", "rot_ang"):
        assert isinstance(dev._priors[attr], D.Uniform), attr
    assert dev.rot_out == 12.0
    assert dev.rot_in == 2.0
    assert dev.rot_pow == 0.5

    assert isinstance(fer, Ferrer)
    assert fer.rout == 8.0 and fer.rout_b == pytest.approx(6.4)


def test_sb_factor_parity_with_device_normalization():
    """Host quadrature twins == the renderers' own flux factors.

    The mu -> mag conversion divides by the SAME radial integral the
    renderer multiplies by, so an imported king/nuker really produces
    the feedme's anchor surface brightness.
    """
    from psfmc_tpu.ops.profiles import (
        king_radial_factor,
        nuker_radial_factor,
    )

    rc, rt, alpha, q = 5.0, 20.0, 2.0, 0.8
    sq_xt = (rt / rc) ** 2
    qk = (1.0 + sq_xt) ** (-1.0 / alpha)
    dev = float(king_radial_factor(np.float64(sq_xt), np.float64(alpha)))
    host = _sb_factor_king(rc, q * rc, rt, alpha)
    # device: flux/i0 = pi rc rc_b kf; SB(0) = i0 (1-q)^alpha
    expect = np.pi * rc * (q * rc) * dev / (1.0 - qk) ** alpha
    assert host == pytest.approx(expect, rel=1e-8)

    rb, a, b, g = 3.0, 1.5, 3.0, 0.5
    dev_n = float(
        nuker_radial_factor(np.float64(a), np.float64(b), np.float64(g))
    )
    host_n = _sb_factor_nuker(rb, rb, a, b, g)
    # device: flux/i0 = pi rb rb_b nf with i0 = SB at the break radius
    assert host_n == pytest.approx(np.pi * rb * rb * dev_n, rel=1e-7)


FEEDME_SB = HEADER + """
 0) king
 1) 30.0 30.0 0 0
 3) 20.0 0       # mu(0) mag/arcsec^2
 4) 5.0  0       # Rc
 5) 20.0 0       # Rt
 6) 2.0  0
 9) 1.0  0
10) 0.0  0

 0) edgedisk
 1) 30.0 30.0 0 0
 3) 21.0 0       # mu(0)
 4) 2.0  0       # scale height
 5) 8.0  0       # scale length
10) 0.0  0
"""


def test_sb_anchor_end_to_end():
    """Imported king/edgedisk render the feedme's central SB exactly.

    Renders each component centered ON a pixel and compares that
    pixel's value to the mu(0)-implied counts/px (point sampling of
    these cored/finite-center profiles is exact at the center).
    """
    import jax.numpy as jnp

    from psfmc_tpu.ops.coords import coord_grids
    from psfmc_tpu.ops.profiles import render_edgedisk, render_king

    comps = components_from_feedme(FEEDME_SB, priors="fixed")
    king, disk = comps
    assert isinstance(king, King) and isinstance(disk, EdgeDisk)

    zp, px_area = 26.0, 0.05 * 0.05
    xg, yg = coord_grids((61, 61))
    img_k = np.asarray(
        render_king(
            jnp.asarray(xg), jnp.asarray(yg),
            jnp.asarray([30.0, 30.0]), jnp.float64(king.mag),
            jnp.float64(king.rc), jnp.float64(king.rc_b),
            jnp.float64(king.rt), jnp.float64(king.alpha),
            jnp.float64(king.angle), jnp.float64(zp),
            angle_degrees=True,
        )
    )
    counts_mu0 = 10.0 ** (-0.4 * (20.0 - zp)) * px_area
    assert img_k[30, 30] == pytest.approx(counts_mu0, rel=1e-6)

    img_d = np.asarray(
        render_edgedisk(
            jnp.asarray(xg), jnp.asarray(yg),
            jnp.asarray([30.0, 30.0]), jnp.float64(disk.mag),
            jnp.float64(disk.rs), jnp.float64(disk.hs),
            jnp.float64(disk.angle), jnp.float64(zp),
            angle_degrees=True,
        )
    )
    counts_mu0 = 10.0 ** (-0.4 * (21.0 - zp)) * px_area
    assert img_d[30, 30] == pytest.approx(counts_mu0, rel=1e-5)
    # GALFIT orders edgedisk 4) scale HEIGHT, 5) scale LENGTH
    assert disk.hs == 2.0 and disk.rs == 8.0


def test_sb_families_require_zp_and_scale():
    body = FEEDME_SB.replace("J) 26.0               # zeropoint\n", "")
    with pytest.raises(ValueError, match="zeropoint"):
        components_from_feedme(body)


def test_model_source_roundtrip(tmp_path):
    """feedme -> model-file text -> DSL parser == direct import."""
    from psfmc_tpu.model_parser import component_list_from_string

    src = feedme_to_model_source(FEEDME_MULTI)
    parsed = component_list_from_string(src, model_dir=str(tmp_path))
    direct = components_from_feedme(FEEDME_MULTI)
    assert [type(c).__name__ for c in parsed] == [
        type(c).__name__ for c in direct
    ]
    # spot-check: constants identical, priors same support
    disk_p, disk_d = parsed[2], direct[2]
    assert disk_p.reff == pytest.approx(disk_d.reff)
    mof_p, mof_d = parsed[4], direct[4]
    np.testing.assert_allclose(
        mof_p._priors["fwhm"].rv_frozen.support(),
        mof_d._priors["fwhm"].rv_frozen.support(),
    )


def test_unknown_type_warns_and_skips():
    body = HEADER + """
 0) powsersic
 1) 30.0 30.0 0 0
 3) 20.0 0

 0) sky
 1) 3.0 0
"""
    with pytest.warns(UserWarning, match="powsersic"):
        comps = components_from_feedme(body)
    assert len(comps) == 1 and isinstance(comps[0], Sky)


def test_margin_overrides_and_validation():
    with pytest.raises(ValueError, match="unknown margin"):
        components_from_feedme(FEEDME_MULTI, margins={"bogus": 1.0})
    comps = components_from_feedme(
        FEEDME_MULTI, margins={"position": 2.0}
    )
    ps = comps[1]
    lo, hi = ps._priors["xy"].rv_frozen.support()
    np.testing.assert_allclose(np.asarray(hi) - np.asarray(lo), 4.0)


def test_ferrer_sb_factor_parity():
    """GALFIT's ferrer is mu(0)-parameterized; the closed-form host
    twin must equal the renderer's own normalization factor."""
    from psfmc_tpu.ops.profiles import ferrer_radial_factor

    ro, a, b = 8.0, 2.0, 1.0
    dev = float(
        ferrer_radial_factor(np.float64(a), np.float64(b))
    )
    host = _sb_factor_ferrer(ro, 0.8 * ro, a, b)
    # device: flux/i0 = pi rout rout_b ff with SB(0) = i0 exactly
    assert host == pytest.approx(np.pi * ro * 0.8 * ro * dev, rel=1e-10)


def test_results_to_feedme_roundtrip():
    """import (fixed) -> export -> re-import reproduces every value.

    Covers the reverse conversions: +1 positions, -90 angles, ExpDisk
    scale length, Gaussian FWHM, axis ratios, and the mag -> mu
    inversion for the SB families.
    """
    full = FEEDME_MULTI + FEEDME_SB.replace(HEADER, "")
    direct = components_from_feedme(full, priors="fixed")
    out = results_to_feedme(
        direct, mag_zeropoint=26.0, plate_scale=(0.05, 0.05)
    )
    back = components_from_feedme(out, priors="fixed")
    assert [type(c).__name__ for c in back] == [
        type(c).__name__ for c in direct
    ]
    for c_d, c_b in zip(direct, back):
        for attr in sorted(c_d._constants):
            v_d = np.asarray(getattr(c_d, attr), np.float64)
            v_b = np.asarray(getattr(c_b, attr), np.float64)
            np.testing.assert_allclose(
                v_b, v_d, rtol=2e-3, atol=5e-4,
                err_msg=f"{type(c_d).__name__}.{attr}",
            )


def test_results_to_feedme_toggles_and_db_means():
    """Free priors export toggle 1 / constants 0; a database exports
    posterior means in place of prior values."""
    comps = components_from_feedme(FEEDME_MULTI)
    out = results_to_feedme(
        comps, mag_zeropoint=26.0, plate_scale=(0.05, 0.05)
    )
    parsed = parse_feedme(out)
    mof = [o for o in parsed.objects if o.kind == "moffat"][0]
    assert mof.params["4"][1] == [1]  # fwhm was free
    assert mof.params["5"][1] == [0]  # beta was fixed
    sky = [o for o in parsed.objects if o.kind == "sky"][0]
    assert sky.params["1"][1] == [0] and sky.params["2"][1] == [1]

    # posterior means via a synthetic trace database
    from psfmc_tpu.io.table import Table

    # trace names are assigned at spec build; mirror it here
    for i, c in enumerate(comps):
        c.update_stochastic_names(count=i)
    ps = comps[1]  # PointSource with free xy + mag
    names = [p.name for _a, p in ps.sorted_prior_items()]
    assert any("PointSource_mag" in n for n in names)
    mag_col = [n for n in names if n.endswith("_mag")][0]
    xy_col = [n for n in names if n.endswith("_xy")][0]
    n = 16
    db = Table(
        {
            mag_col: np.full(n, 19.25),
            xy_col: np.tile([31.0, 41.0], (n, 1)),
            "lnprobability": np.zeros(n),
            "walker": np.repeat([0, 1], n // 2),
            "sample": np.tile(np.arange(n // 2), 2),
        }
    )
    out_db = results_to_feedme(
        comps, database=db, mag_zeropoint=26.0, plate_scale=(0.05, 0.05)
    )
    ps_obj = [o for o in parse_feedme(out_db).objects if o.kind == "psf"][0]
    assert ps_obj.params["3"][0][0] == pytest.approx(19.25)
    assert ps_obj.params["1"][0] == pytest.approx([32.0, 42.0])


FEEDME_CON = HEADER + """
 0) sersic
 1) 30.0 30.0 1 1
 3) 20.0 1
 4) 5.0  1
 5) 2.5  1
 9) 0.8  0
10) 0.0  0

 0) psf
 1) 30.0 30.0 1 1
 3) 21.0 1
"""

CONSTRAINTS = """
# comp  par  constraint
 1      n    0.5 to 6      # absolute range
 1      mag  -1 1          # relative range
 1      re   2 to 9        # absolute size range
 2_1    x    offset        # couple positions (zero initial offset)
 2_1    y    offset
"""


def test_constraint_ranges_and_ties():
    from psfmc_tpu.models.components import Tied

    comps = components_from_feedme(FEEDME_CON, constraints=CONSTRAINTS)
    ser, ps = comps
    lo, hi = ser._priors["index"].rv_frozen.support()
    assert (lo, hi) == pytest.approx((0.5, 6.0))
    lo, hi = ser._priors["mag"].rv_frozen.support()
    assert (lo, hi) == pytest.approx((19.0, 21.0))
    lo, hi = ser._priors["reff"].rv_frozen.support()
    assert (lo, hi) == pytest.approx((2.0, 9.0))
    # the PSF position is tied to the Sersic centroid (exact)
    assert isinstance(ps._constants["xy"], Tied)
    assert ps._constants["xy"].component is ser

    # the generated model source carries the tie and parses back
    from psfmc_tpu.model_parser import component_list_from_string

    src = feedme_to_model_source(FEEDME_CON, constraints=CONSTRAINTS)
    assert "Tied(c1, 'xy')" in src
    parsed = component_list_from_string(src)
    assert isinstance(parsed[1]._constants["xy"], Tied)
    assert parsed[1]._constants["xy"].component is parsed[0]


def test_constraint_warnings():
    comps_txt = FEEDME_CON
    with pytest.warns(UserWarning, match="initial values differ"):
        components_from_feedme(
            comps_txt, constraints=" 2_1 mag offset\n"
        )  # mags 20 vs 21: not an exact tie
    with pytest.warns(UserWarning, match="axis-ratio"):
        components_from_feedme(comps_txt, constraints=" 1 q 0.5 to 1\n")
    with pytest.warns(UserWarning, match="fixed in the feedme"):
        components_from_feedme(comps_txt, constraints=" 1 pa -10 10\n")


def test_constraint_autoload_from_g_entry(tmp_path):
    (tmp_path / "cons.txt").write_text(" 1 n 1.0 to 4.0\n")
    feedme = FEEDME_CON.replace(
        "P) 0", "P) 0\nG) cons.txt"
    )
    (tmp_path / "gal.feedme").write_text(feedme)
    comps = components_from_feedme(str(tmp_path / "gal.feedme"))
    lo, hi = comps[0]._priors["index"].rv_frozen.support()
    assert (lo, hi) == pytest.approx((1.0, 4.0))
    # a tied model builds into a working spec (shared slots)
    comps2 = components_from_feedme(
        FEEDME_CON, constraints=CONSTRAINTS
    )
    from psfmc_tpu.models.spec import build_param_slots

    slots, slot_map, _ = build_param_slots(comps2)
    names = [s.name for s in slots]
    assert not any("PointSource_xy" in n for n in names)  # tied: no slot


def test_pair_range_constraint_is_not_a_tie():
    """`2_1 mag -0.5 0.5` bounds a DIFFERENCE — equal initial values
    must NOT silently become an exact tie."""
    from psfmc_tpu.models.components import Tied

    feedme = FEEDME_CON.replace("3) 21.0 1", "3) 20.0 1")  # equal mags
    with pytest.warns(UserWarning, match="pair ranges"):
        comps = components_from_feedme(
            feedme, constraints=" 2_1 mag -0.5 0.5\n"
        )
    assert not isinstance(comps[1]._constants.get("mag"), Tied)
    assert "mag" in comps[1]._priors


def test_psf_oversample_hint_from_e_entry():
    src = feedme_to_model_source(
        "J) 26.0\nK) 0.05 0.05\nE) 5\n 0) sky\n 1) 1.0 0\n"
    )
    assert "psf_oversample=5" in src
    src2 = feedme_to_model_source(
        "J) 26.0\nK) 0.05 0.05\n 0) sky\n 1) 1.0 0\n"
    )
    assert "psf_oversample" not in src2


@pytest.mark.parametrize("rc,rt,alpha", [
    (3.0, 9.0, 2.0), (5.0, 40.0, 1.2), (2.0, 5.0, 3.5),
])
def test_king_factor_grid(rc, rt, alpha):
    from psfmc_tpu.ops.profiles import king_radial_factor

    sq_xt = (rt / rc) ** 2
    qk = (1.0 + sq_xt) ** (-1.0 / alpha)
    dev = float(king_radial_factor(np.float64(sq_xt), np.float64(alpha)))
    host = _sb_factor_king(rc, rc, rt, alpha)
    assert host == pytest.approx(
        np.pi * rc * rc * dev / (1.0 - qk) ** alpha, rel=1e-6
    )


@pytest.mark.parametrize("alpha,beta,gamma", [
    (1.5, 3.0, 0.5), (0.8, 2.5, -0.3), (4.0, 5.0, 1.5),
])
def test_nuker_factor_grid(alpha, beta, gamma):
    from psfmc_tpu.ops.profiles import nuker_radial_factor

    dev = float(nuker_radial_factor(
        np.float64(alpha), np.float64(beta), np.float64(gamma)
    ))
    host = _sb_factor_nuker(2.0, 2.0, alpha, beta, gamma)
    assert host == pytest.approx(np.pi * 4.0 * dev, rel=1e-6)


def test_import_galfit_cli(tmp_path):
    from psfmc_tpu.cli import import_galfit_main

    fm = tmp_path / "gal.feedme"
    fm.write_text(HEADER + "\n 0) sky\n 1) 4.0 1\n")
    out = tmp_path / "model.py"
    assert import_galfit_main(["x", str(fm), str(out)]) == 0
    text = out.read_text()
    assert "Sky(adu=Uniform" in text
    # the written file runs through the DSL
    from psfmc_tpu.model_parser import component_list_from_file

    comps = component_list_from_file(str(out))
    assert len(comps) == 1
    assert import_galfit_main(["x"]) == 2  # usage


def test_tied_export_uses_owner_posterior_mean():
    """A Tied attribute exports its OWNER's posterior mean (and free
    toggle) — not the owner prior's stale construction-time value
    (advisor round-3 finding: the coupled geometry silently broke in
    database exports)."""
    from psfmc_tpu.io.table import Table

    comps = components_from_feedme(FEEDME_CON, constraints=CONSTRAINTS)
    ser, ps = comps
    for i, c in enumerate(comps):
        c.update_stochastic_names(count=i)
    xy_col = ser._priors["xy"].name
    n = 8
    cols = {
        xy_col: np.tile([33.25, 35.5], (n, 1)),
        "lnprobability": np.zeros(n),
        "walker": np.repeat([0, 1], n // 2),
        "sample": np.tile(np.arange(n // 2), 2),
    }
    for _a, p in ser.sorted_prior_items():
        if p.name not in cols:
            cols[p.name] = np.full(n, float(np.mean(p.value)))
    for _a, p in ps.sorted_prior_items():
        cols[p.name] = np.full(n, float(np.mean(p.value)))
    db = Table(cols)
    out = results_to_feedme(
        comps, database=db, mag_zeropoint=26.0, plate_scale=(0.05, 0.05)
    )
    parsed = parse_feedme(out)
    ser_o = [o for o in parsed.objects if o.kind == "sersic"][0]
    ps_o = [o for o in parsed.objects if o.kind == "psf"][0]
    # both carry the shared slot's posterior mean (back to 1-based)
    assert ser_o.params["1"][0] == pytest.approx([34.25, 36.5])
    assert ps_o.params["1"][0] == pytest.approx([34.25, 36.5])
    # toggle follows the OWNER's free state
    assert ps_o.params["1"][1] == [1, 1]


def test_multi_component_couple_ties_to_first():
    """GALFIT's grammar allows couples of any length ('3_2_1 mag
    offset'): every later component ties to the first instead of
    aborting the import (advisor round-3 finding)."""
    from psfmc_tpu.models.components import Tied

    feedme = FEEDME_CON.replace("3) 21.0 1", "3) 20.0 1") + (
        "\n 0) psf\n 1) 40.0 40.0 1 1\n 3) 20.0 1\n"
    )
    comps = components_from_feedme(
        feedme, constraints=" 3_2_1 mag offset\n"
    )
    ser, ps1, ps2 = comps
    assert isinstance(ps1._constants.get("mag"), Tied)
    assert ps1._constants["mag"].component is ser
    assert isinstance(ps2._constants.get("mag"), Tied)
    assert ps2._constants["mag"].component is ser


def test_xy_couple_to_sky_warns_not_raises():
    """An x/y couple referencing a component without a position (a
    mis-numbered constraint hitting the sky) warns instead of raising
    KeyError (advisor round-3 finding)."""
    feedme = HEADER + (
        " 0) sky\n 1) 1.0 1\n\n"
        " 0) psf\n 1) 30.0 30.0 1 1\n 3) 21.0 1\n"
    )
    with pytest.warns(UserWarning, match="has no position"):
        comps = components_from_feedme(
            feedme, constraints=" 2_1 x offset\n 2_1 y offset\n"
        )
    assert len(comps) == 2  # import survived


def test_support_clamped_bounds_keep_the_value_inside():
    """Renderer-support clamping (nuker gamma <= 1.95) must not
    produce a prior that excludes the GALFIT value: the value clamps
    into the support with a warning (advisor round-3 finding)."""
    feedme = HEADER + (
        " 0) nuker\n 1) 30.0 30.0 1 1\n 3) 18.0 1\n 4) 5.0 1\n"
        " 5) 1.5 1\n 6) 4.0 1\n 7) 1.98 1\n 9) 1.0 0\n10) 0.0 0\n"
    )
    with pytest.warns(UserWarning, match="gamma.*outside"):
        comps = components_from_feedme(feedme)
    (nk,) = comps
    lo, hi = nk._priors["gamma"].rv_frozen.support()
    assert hi <= 1.95 + 1e-9
    # the prior contains the clamped starting value
    assert lo <= hi
    assert np.isfinite(float(nk._priors["gamma"].logp(hi - 1e-6)))

    # a DIVERGENT flux integral (gamma >= 2) fails loudly, not NaN
    bad = feedme.replace("7) 1.98 1", "7) 2.5 1")
    with pytest.raises(ValueError, match="divergent"):
        components_from_feedme(bad)


def test_rot_ang_exports_degrees_for_radians_mode():
    """R3 is a GALFIT degrees field: a radians-mode component's
    rot_ang converts on export (advisor round-3 finding)."""
    ser = Sersic(
        xy=np.array([30.0, 30.0]), mag=20.0, reff=5.0, reff_b=4.0,
        index=2.0, angle=0.5, angle_degrees=False,
        rot_ang=1.0, rot_out=5.0,
    )
    out = results_to_feedme([ser])
    parsed = parse_feedme(out)
    (obj,) = parsed.objects
    assert obj.params["R3"][0][0] == pytest.approx(np.rad2deg(1.0))
    assert obj.params["10"][0][0] == pytest.approx(
        np.rad2deg(0.5) - 90.0
    )


def test_conv_pad_hint_from_i_entry():
    """GALFIT I) convolution box -> conv_pad hint (= ceil(box/2)) in
    the generated model (round-3 verdict item 4)."""
    src = feedme_to_model_source(
        "J) 26.0\nK) 0.05 0.05\nI) 60 50\n 0) sky\n 1) 1.0 0\n"
    )
    assert "conv_pad=30" in src
    assert "convolution box" in src
    src2 = feedme_to_model_source(
        "J) 26.0\nK) 0.05 0.05\n 0) sky\n 1) 1.0 0\n"
    )
    assert "conv_pad" not in src2


def test_fit_region_note_from_h_entry():
    """GALFIT H) fit region -> explicit 0-based cutout note."""
    src = feedme_to_model_source(
        "J) 26.0\nK) 0.05 0.05\nH) 101 228 51 178\n"
        " 0) sky\n 1) 1.0 0\n"
    )
    assert "fit region x:101-228 y:51-178" in src
    assert "full_obs[50:178, 100:228]" in src


def test_feedme_totality_fuzz():
    """Round-5 fuzz: structurally-plausible garbage feedmes either
    convert or raise ValueError — never IndexError/TypeError (found:
    bare '0)' line; sersic missing its required 3) mag line hit a
    NoneType TypeError mid-conversion)."""
    from hypothesis import given, settings, strategies as st

    from psfmc_tpu.io.galfit import components_from_feedme

    kinds = st.sampled_from(
        ["sersic", "expdisk", "devauc", "psf", "sky", "gaussian",
         "moffat", "king", "nuker", "ferrer", "edgedisk", "garbage"]
    )
    num = st.floats(-100, 100, allow_nan=False).map(lambda v: f"{v:.4g}")
    pkey = st.sampled_from(
        ["1", "2", "3", "4", "5", "6", "7", "8", "9", "10",
         "C0", "F1", "B2", "R1", "R2", "R3", "R4", "T0", "Z"]
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(
        st.tuples(kinds, st.lists(
            st.tuples(pkey, num, st.sampled_from(["0", "1"])), max_size=8
        )),
        min_size=1, max_size=3,
    ))
    def run(objs):
        import warnings

        lines = []
        for kind, params in objs:
            lines.append(f"0) {kind}")
            for k, v, t in params:
                lines.append(f" {k}) {v} {t}")
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                components_from_feedme("\n".join(lines))
        except ValueError:
            pass

    run()


def test_feedme_missing_required_line_is_value_error():
    import pytest

    from psfmc_tpu.io.galfit import components_from_feedme, parse_feedme

    with pytest.raises(ValueError, match="required 3\\)"):
        components_from_feedme("0) sersic\n 1) 10 10 1 1\n")
    with pytest.raises(ValueError, match="no\\s+component type"):
        parse_feedme("0)\n")
