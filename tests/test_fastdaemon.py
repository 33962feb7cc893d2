"""The zipimport TOC-memoization patch must never introduce a failure
mode the stock zipimporter lacks: an instance with no usable .archive
degrades to stock behavior (stock raises AttributeError for a missing
attribute), not a TypeError from os.stat(None) inside the patch."""

import zipimport

import pytest

from html_table_spark import fastdaemon


def test_patch_applies_and_is_idempotent():
    assert fastdaemon.apply() is True
    assert fastdaemon.apply() is True  # second call hits the marker
    assert getattr(zipimport.zipimporter, "_htmltable_fast_invalidate", False)


def test_missing_archive_defers_to_stock_error():
    fastdaemon.apply()
    zi = zipimport.zipimporter.__new__(zipimport.zipimporter)
    with pytest.raises(AttributeError):
        # pre-fix the patch raised TypeError (os.stat(None)) before the
        # stock path ran; post-fix the stock AttributeError surfaces
        zi.invalidate_caches()


def test_memoization_skips_redundant_directory_reads(tmp_path):
    import zipfile

    p = tmp_path / "m.zip"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("mod_fastdaemon_probe.py", "X = 1\n")
    fastdaemon.apply()
    zi = zipimport.zipimporter(str(p))
    zi.invalidate_caches()
    sig1 = getattr(zi, "_htmltable_toc_sig", None)
    assert sig1 is not None
    zi.invalidate_caches()  # unchanged file: memoized, sig stays
    assert getattr(zi, "_htmltable_toc_sig", None) == sig1
