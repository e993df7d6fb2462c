"""Driver-side FS post-processing (SURVEY.md §2.1 op 8)."""

from __future__ import annotations

import os
import stat

from hbase_bulkload_spark.sources import fsutil


def _tree(tmp_path):
    (tmp_path / "a" / "b").mkdir(parents=True)
    (tmp_path / "a" / "f1").write_text("x")
    (tmp_path / "a" / "b" / "f2").write_text("y")
    (tmp_path / "f0").write_text("z")
    return str(tmp_path)


def test_list_files_recursive(tmp_path):
    root = _tree(tmp_path)
    files = fsutil.list_files_recursive(root)
    assert sorted(os.path.basename(f) for f in files) == ["f0", "f1", "f2"]


def test_set_permissions_recursive(tmp_path):
    root = _tree(tmp_path)
    n = fsutil.set_permissions_recursive(root, 0o700)
    assert n == 6  # root + dirs a, a/b + files f0, f1, f2
    for f in fsutil.list_files_recursive(root):
        assert stat.S_IMODE(os.stat(f).st_mode) == 0o700


def test_cleanup_temp(tmp_path):
    root = _tree(tmp_path)
    assert fsutil.cleanup_temp(os.path.join(root, "a")) is True
    assert not os.path.exists(os.path.join(root, "a"))
    assert fsutil.cleanup_temp(os.path.join(root, "a")) is False
