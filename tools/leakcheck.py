"""Regenerate LEAKCHECK.json: grep the repo's shippable surface for
anything that could be a non-public dependency or reference.

Everything in this repo must derive from public knowledge (the public
reference repo, Apache Spark, published papers). This sweep looks for
the ways that rule usually breaks:

- imports outside the baked-in public stack,
- URLs that are not apache/github/python.org/spec hosts,
- cloud bucket / object-store URIs,
- slack-style short links,
- credential-shaped strings (long high-entropy literals, AKIA... ids),
- environment variables outside the repo's own SPARK_GRAFT_*/SPARK_*/
  JAVA_* namespaces.

Scope: tracked non-test source + docs, excluding the judge/driver
artifacts themselves. Hits are listed with file:line so a human can
adjudicate; the artifact commits the full hit lists, not just counts.

Usage: python tools/leakcheck.py [round_number]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: public stack available in this environment plus the stdlib — any
#: other import is a leak candidate
PUBLIC_TOP_LEVEL = {
    "pyspark", "pyarrow", "pandas", "numpy", "duckdb", "pytest",
    "hypothesis", "py4j", "hbase_bulkload_spark", "__spark_entry__",
    "bench", "bench_merge", "scale_probe",  # repo-local tools/ modules
}

URL_ALLOW = re.compile(
    r"https?://(www\.)?("
    r"apache\.org|spark\.apache\.org|hbase\.apache\.org|avro\.apache\.org|"
    r"hadoop\.apache\.org|arrow\.apache\.org|github\.com|raw\.githubusercontent\.com|"
    r"python\.org|docs\.python\.org|pypi\.org|duckdb\.org|numpy\.org|"
    r"pandas\.pydata\.org|w3\.org|ietf\.org|rfc-editor\.org|iso\.org|"
    r"wikipedia\.org|arxiv\.org|dl\.acm\.org|doi\.org|"
    r"eia\.gov|data\.gov"  # the reference's own public data source
    r")([/:#]|$)"
)

ENV_ALLOW = re.compile(
    r"^(SPARK_GRAFT_\w+|SPARK_\w+|PYSPARK\w*|JAVA_\w+|PYTHONPATH|PATH|HOME|"
    r"TMPDIR|TZ|USER|LANG|LC_\w+|ARROW_\w+|OMP_\w+|HADOOP_\w+)$"
)


def tracked_files() -> list[str]:
    out = subprocess.run(
        ["git", "ls-files"], capture_output=True, text=True, cwd=ROOT
    ).stdout.split()
    keep = []
    for p in out:
        if p.startswith(("tests/", ".claude", ".gitignore")):
            continue
        if re.match(r"(VERDICT|ADVICE|CORRECTNESS|BENCH|SCALE|RECALL|LEAKCHECK|"
                    r"COPYCHECK|PROGRESS|PAPERS|SNIPPETS)", os.path.basename(p)):
            continue
        if p.endswith((".py", ".md", ".sh", ".toml", ".cfg", ".json")):
            keep.append(p)
    return keep


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hits: dict[str, list[str]] = {
        "nonpublic-import": [],
        "nonpublic-url": [],
        "bucket-uri": [],
        "slack-link": [],
        "credential-shaped": [],
        "nonpublic-env": [],
    }
    url = re.compile(r"https?://[^\s'\")>\]]+")
    bucket = re.compile(r"\b(s3|s3a|s3n|gs|abfss?|wasbs?)://[^\s'\")>\]]+")
    slack = re.compile(r"\bgo/[a-z][\w-]+|slack\.com/|#[a-z][\w-]*-(channel|feedback|eng)\b")
    cred = re.compile(r"\b(AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|xox[bap]-[\w-]{10,})\b")
    env = re.compile(r"environ(?:\.get)?\[?\(?\s*['\"]([A-Z][A-Z0-9_]+)['\"]")

    import sysconfig
    stdlib = set(sys.stdlib_module_names)

    for path in tracked_files():
        full = os.path.join(ROOT, path)
        try:
            text = open(full, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        if path.endswith(".py"):
            # AST, not regex: docstring prose that happens to start a
            # line with "from ..." must not read as an import
            import ast

            try:
                tree = ast.parse(text)
            except SyntaxError as e:
                hits["nonpublic-import"].append(f"{path}: unparseable: {e}")
                tree = None
            if tree is not None:
                for node in ast.walk(tree):
                    if isinstance(node, ast.Import):
                        names = [a.name for a in node.names]
                    elif isinstance(node, ast.ImportFrom) and node.level == 0:
                        names = [node.module or ""]
                    else:
                        continue
                    for name in names:
                        top = name.split(".")[0]
                        if top and top not in stdlib and top not in PUBLIC_TOP_LEVEL:
                            hits["nonpublic-import"].append(
                                f"{path}:{node.lineno}: import {name}"
                            )
        for i, line in enumerate(text.splitlines(), 1):
            loc = f"{path}:{i}"
            if path.endswith(".py"):
                for e in env.findall(line):
                    if not ENV_ALLOW.match(e):
                        hits["nonpublic-env"].append(f"{loc}: {e}")
            for u in url.findall(line):
                if not URL_ALLOW.match(u):
                    hits["nonpublic-url"].append(f"{loc}: {u}")
            if bucket.search(line):
                hits["bucket-uri"].append(f"{loc}: {line.strip()[:120]}")
            if slack.search(line):
                hits["slack-link"].append(f"{loc}: {line.strip()[:120]}")
            if cred.search(line):
                hits["credential-shaped"].append(f"{loc}: <redacted match>")

    doc = {
        "round": rnd,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "generator": "tools/leakcheck.py",
    }
    with open(os.path.join(ROOT, "LEAKCHECK.json"), "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(json.dumps({k: len(v) for k, v in hits.items()}, indent=1))
    for k, v in hits.items():
        for h in v[:10]:
            print(f"  {k}: {h}")


if __name__ == "__main__":
    main()
