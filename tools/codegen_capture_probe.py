"""Capture every generated-code compile during a real fiedler run and
cluster near-duplicate sources to find what varies between iterations.

Turns on DEBUG logging for the Janino CodeGenerator (it logs the full
formatted source on every actual compile — cache hits log nothing),
runs fiedler for a few iterations at sf0.001, then parses the log:
groups sources by a normalized fingerprint (comments and /* ... */
stripped) and prints, for the largest cluster of distinct-but-similar
sources, a unified diff of two members.

Usage: python tools/codegen_capture_probe.py [iters]
"""

from __future__ import annotations

import difflib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parrsb_spark import entry_queries as EQ
from parrsb_spark.config import EngineOptions
from parrsb_spark.operators.fiedler import fiedler
from parrsb_spark.session import get_spark

LOG = "/tmp/codegen_capture.log"
L4J = "/tmp/l4j_codegen.properties"
L4J_BODY = """\
status = error
appender.file.type = File
appender.file.name = CGFILE
appender.file.fileName = /tmp/codegen_capture.log
appender.file.layout.type = PatternLayout
appender.file.layout.pattern = %m%n
logger.cg.name = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
logger.cg.level = debug
logger.cg.appenderRef.file.ref = CGFILE
logger.cg.additivity = false
rootLogger.level = error
"""


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    # self-contained log4j2 config: routes the CodeGenerator logger at
    # DEBUG to /tmp/codegen_capture.log — every ACTUAL compile logs its
    # full source there; cache hits log nothing.
    with open(L4J, "w") as f:
        f.write(L4J_BODY)
    os.environ["JAVA_TOOL_OPTIONS"] = (
        f"-Dlog4j.configurationFile={L4J}")
    if os.path.exists(LOG):
        os.remove(LOG)
    spark = get_spark(master="local[4]", app_name="codegen-capture",
                      shuffle_partitions=4)

    edges = EQ.bipartite_edges(spark, "/root/testdata/sf0.001").cache()
    edges.count()
    # warm run then measured run: only steady-state compiles interest us
    opts = EngineOptions(rsb_max_iter=iters, rsb_max_passes=1, rsb_tol=1e-12)
    fiedler(edges, opts=opts).count()
    warm_bytes = os.path.getsize(LOG) if os.path.exists(LOG) else 0
    fiedler(edges, opts=opts).count()
    spark.stop()

    if not os.path.exists(LOG):
        sys.exit(
            f"no {LOG} written — the JVM did not pick up {L4J} "
            "(JAVA_TOOL_OPTIONS must be set before the gateway JVM starts; "
            "re-run with no live SparkSession in this process)"
        )
    # slice at the BYTE offset, decode after: a multibyte char anywhere in
    # the warm-run log would shift a str-index cut into the warm data
    with open(LOG, "rb") as f:
        text = f.read()[warm_bytes:].decode("utf-8", errors="replace")
    # each compile logs one big block starting with "/* 001 */"
    blocks = re.split(r"\nCode generated in [0-9.]+ ms\n?", text)
    srcs = []
    for b in blocks:
        lines = [l for l in b.splitlines() if re.match(r"/\* \d+ \*/", l)]
        if len(lines) > 5:
            body = "\n".join(re.sub(r"^/\* \d+ \*/ ?", "", l) for l in lines)
            srcs.append(body)
    print(f"captured {len(srcs)} compiled sources in run 2", file=sys.stderr)

    def norm(s):
        s = re.sub(r"/\*.*?\*/", "", s, flags=re.S)
        s = re.sub(r"//.*", "", s)
        return re.sub(r"\s+", " ", s)

    # bucket by (class name-ish prefix, length//200) to find near-dupes
    from collections import defaultdict
    buckets = defaultdict(list)
    for s in srcs:
        m = re.search(r"class (\w+)", s)
        buckets[(m.group(1) if m else "?", len(norm(s)) // 400)].append(s)
    big = sorted(buckets.items(), key=lambda kv: -len(kv[1]))
    for (name, lb), members in big[:4]:
        uniq = sorted(set(norm(m) for m in members))
        print(f"bucket class={name} lenband={lb}: {len(members)} compiles, "
              f"{len(uniq)} distinct normalized")
        if len(uniq) >= 2:
            a, b = uniq[0], uniq[1]
            # token-level diff of the two normalized sources
            sm = difflib.SequenceMatcher(a=a.split(), b=b.split())
            for op, i1, i2, j1, j2 in sm.get_opcodes():
                if op != "equal":
                    print(f"  {op}: A[{i1}:{i2}]={' '.join(a.split()[i1:i2])[:200]!r}")
                    print(f"       B[{j1}:{j2}]={' '.join(b.split()[j1:j2])[:200]!r}")


if __name__ == "__main__":
    main()
