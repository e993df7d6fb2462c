"""Driver-side filesystem post-processing (SURVEY.md §2.1 op 8).

The reference, after the MR job and before the bulk-load handoff,
recursively lists the output tree (`getAllFilePath`,
`BulkImporterFromText.java:150-162`), chmods every path to 777 so the
HBase region servers can move the HFiles
(`BulkImporterFromText.java:119-126`), and deletes the temp output dir
when done (`BulkImporterFromCSVText.java:133`; commented out in the
Text variant, `BulkImporterFromText.java:133`).

These are driver-side actions, not DataFrame operators — so they live
here as plain-Python utilities over the local filesystem (the
`pyarrow.fs` generalization drops in for object stores). The blanket
0o777 is the reference's documented behavior, not a recommendation; the
mode is a parameter.
"""

from __future__ import annotations

import os
import shutil


def list_files_recursive(root: str) -> list[str]:
    """Every file under `root`, depth-first — `getAllFilePath`
    (`BulkImporterFromText.java:150-162`) without the HDFS client."""
    out: list[str] = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in sorted(filenames):
            out.append(os.path.join(dirpath, name))
    return out


def set_permissions_recursive(root: str, mode: int = 0o777) -> int:
    """chmod `root` and everything under it; returns the path count —
    the fix-permissions loop (`BulkImporterFromText.java:119-126`)."""
    n = 0
    os.chmod(root, mode)
    n += 1
    for dirpath, dirnames, filenames in os.walk(root):
        for name in dirnames + filenames:
            os.chmod(os.path.join(dirpath, name), mode)
            n += 1
    return n


def cleanup_temp(path: str) -> bool:
    """Remove a temp output tree if present; returns whether it existed
    (`fs.delete(outputPath)`, `BulkImporterFromCSVText.java:133`)."""
    if os.path.isdir(path):
        shutil.rmtree(path)
        return True
    return False
