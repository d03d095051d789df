"""FITS codec + Table tests, including reads of real reference files."""
import os

import numpy as np
import pytest

from psfmc_tpu.io import fits
from psfmc_tpu.io.table import Table


def test_image_roundtrip(tmp_path):
    img = np.arange(35 * 21, dtype=np.float32).reshape(35, 21) / 7.0
    hdr = fits.Header()
    hdr.set("OBJECT", "x'y", "quoted string")
    hdr.set("MAGZPT", 25.9463)
    hdr.set("NITER", 12345)
    hdr.set("CONVRG", True)
    hdr.append(("COMMENT", "a comment card"))
    path = str(tmp_path / "img.fits")
    fits.writeto(path, img, header=hdr)

    out = fits.getdata(path)
    h2 = fits.getheader(path)
    assert np.array_equal(out, img)
    assert h2["OBJECT"] == "x'y"
    assert h2["MAGZPT"] == pytest.approx(25.9463, abs=1e-12)
    assert h2["NITER"] == 12345
    assert h2["CONVRG"] is True


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.int32, np.float64])
def test_image_dtypes(tmp_path, dtype):
    img = (np.arange(64).reshape(8, 8) % 100).astype(dtype)
    path = str(tmp_path / "d.fits")
    fits.writeto(path, img)
    out = fits.getdata(path)
    assert np.array_equal(out, img)


def test_read_reference_images(reference_dir):
    sci = fits.getdata(os.path.join(reference_dir, "examples/sci_J0005-0006.fits"))
    assert sci.shape == (128, 128)
    assert sci.dtype == np.float32
    psf = fits.getdata(os.path.join(reference_dir, "examples/sci_psf.fits"))
    assert psf.shape == (64, 64)


def test_read_gzipped_fits(reference_dir):
    path = os.path.join(reference_dir, "tests/gfsim_n4.0.fits.gz")
    data = fits.getdata(path)
    hdr = fits.getheader(path)
    assert data.shape == (128, 128)
    assert hdr["MAGZPT"] == pytest.approx(26.2303)
    # GALFIT result cards are strings like '6.3000 +/- 0.0000'
    assert "+/-" in hdr["1_RE"]


def test_table_roundtrip(tmp_path):
    n = 50
    tbl = Table(
        {
            "scalar": np.linspace(0, 1, n),
            "vec": np.arange(2 * n, dtype=np.float64).reshape(n, 2),
            "ints": np.arange(n),
            "flag": np.arange(n) % 2 == 0,
        },
        meta={"MCITER": (n, "iterations"), "MCACCEPT": 0.25},
    )
    path = str(tmp_path / "t.fits")
    tbl.write(path)
    t2 = Table.read(path)
    assert t2.colnames == tbl.colnames
    assert np.allclose(t2["scalar"], tbl["scalar"])
    assert np.allclose(t2["vec"], tbl["vec"])
    assert np.array_equal(t2["ints"], tbl["ints"])
    assert np.array_equal(t2["flag"], tbl["flag"])
    assert t2.meta["MCITER"] == n
    assert t2.meta["MCACCEPT"] == pytest.approx(0.25)


def test_table_row_ops():
    tbl = Table({"a": np.arange(10.0), "b": np.arange(10) % 3})
    filtered = tbl[tbl["b"] > 0]
    assert len(filtered) == 6
    sub = tbl[["a"]]
    assert sub.colnames == ["a"]
    rows = list(sub)
    assert rows[3] == (3.0,)


def test_bscale_bzero_image(tmp_path):
    """Scaled-integer images (BSCALE/BZERO, the classic HST int16
    convention) must decode to physical values."""
    import struct

    from psfmc_tpu.io.fits import read_hdus

    h = w = 4
    raw = np.arange(h * w, dtype=">i2").reshape(h, w)
    bscale, bzero = 0.25, 100.0
    cards = [
        ("SIMPLE", "T"), ("BITPIX", "16"), ("NAXIS", "2"),
        ("NAXIS1", str(w)), ("NAXIS2", str(h)),
        ("BSCALE", repr(bscale)), ("BZERO", repr(bzero)),
    ]
    hdr = b"".join(
        f"{k:<8}= {v:>20}".ljust(80).encode() for k, v in cards
    ) + b"END".ljust(80)
    hdr = hdr.ljust(2880, b" ")
    payload = raw.tobytes().ljust(2880, b"\x00")
    path = tmp_path / "scaled.fits"
    path.write_bytes(hdr + payload)

    (header, data), = read_hdus(str(path))
    want = raw.astype(np.float64) * bscale + bzero
    assert np.allclose(np.asarray(data, np.float64), want)


def test_fits_reader_total_on_garbage_bytes(tmp_path):
    """Round-5 fuzz (400+ random byte blobs + truncated-valid-header
    variants): a corrupt FITS file raises ValueError/OSError, never an
    unexplained IndexError/struct error from mid-parse.  A few fixed
    representative corpses are kept as the regression set."""
    import pytest

    from psfmc_tpu.io.fits import read_hdus

    hdr = (b"SIMPLE  =                    T" + b" " * 50 +
           b"BITPIX  =                  -32" + b" " * 50 +
           b"NAXIS   =                    2" + b" " * 50 +
           b"NAXIS1  =                  100" + b" " * 50 +
           b"NAXIS2  =                  100" + b" " * 50 +
           b"END" + b" " * 77)
    hdr += b" " * (2880 - len(hdr) % 2880)
    corpses = [
        b"",                       # empty file
        b"\x00" * 2880,            # zero block
        b"NOT A FITS FILE",        # short garbage
        hdr,                       # header promises data, none follows
        hdr + b"\x01" * 100,       # truncated data
    ]
    for i, data in enumerate(corpses):
        p = tmp_path / f"c{i}.fits"
        p.write_bytes(data)
        with pytest.raises((ValueError, OSError)):
            read_hdus(str(p))


def test_write_hdus_is_atomic(tmp_path, monkeypatch):
    """The fitting driver overwrites the trace DB (the only copy,
    carrying the resume checkpoint) at every segment boundary — a
    write that dies mid-file must leave the previous version intact
    (round-5 reliability fix: in-place open(path, 'wb') truncated
    first, so any failure destroyed the checkpoint)."""
    import numpy as np
    import pytest

    from psfmc_tpu.io import fits as pf

    path = tmp_path / "db.fits"
    good = np.arange(12, dtype=np.float32).reshape(3, 4)
    pf.writeto(str(path), good)
    before = path.read_bytes()

    # a writer that explodes mid-stream
    real = pf._write_hdus_to

    def boom(fobj, hdus):
        fobj.write(b"partial garbage")
        raise RuntimeError("simulated preemption")

    monkeypatch.setattr(pf, "_write_hdus_to", boom)
    with pytest.raises(RuntimeError, match="preemption"):
        pf.writeto(str(path), good * 2)
    monkeypatch.setattr(pf, "_write_hdus_to", real)

    # previous file untouched, no temp litter
    assert path.read_bytes() == before
    assert list(tmp_path.glob("*.tmp.*")) == []
    np.testing.assert_array_equal(pf.getdata(str(path)), good)

    # normal overwrite still round-trips
    pf.writeto(str(path), good * 3)
    np.testing.assert_array_equal(pf.getdata(str(path)), good * 3)
