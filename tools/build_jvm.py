#!/usr/bin/env python
"""Build geobuf_spark/codec/jvm/gb-codec.jar from GbCodec.java.

No sbt required: the pyspark wheel ships every jar the source compiles
against (spark-sql for the UDF1 interface), and the sandbox JDK provides
javac/jar. The built jar is committed so runtimes without a JDK can still
load the JVM decode path; this script rebuilds it when the source changes.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

JVM_DIR = Path(__file__).resolve().parent.parent / "geobuf_spark" / "codec" / "jvm"
SRC = JVM_DIR / "GbCodec.java"
JAR = JVM_DIR / "gb-codec.jar"


def _java_home() -> Path | None:
    jh = os.environ.get("JAVA_HOME")
    if jh and (Path(jh) / "bin" / "javac").exists():
        return Path(jh)
    javac = shutil.which("javac")
    return Path(javac).parent.parent if javac else None


def build(force: bool = False) -> Path | None:
    """Compile the jar if stale. Returns the jar path, or None if no JDK."""
    if JAR.exists() and not force and JAR.stat().st_mtime >= SRC.stat().st_mtime:
        return JAR
    jh = _java_home()
    if jh is None:
        return JAR if JAR.exists() else None
    import pyspark

    spark_jars = Path(pyspark.__file__).parent / "jars"
    with tempfile.TemporaryDirectory(prefix="gbjvm_") as tmp:
        subprocess.run(
            [str(jh / "bin" / "javac"), "-cp", f"{spark_jars}/*",
             "-d", tmp, str(SRC)],
            check=True)
        subprocess.run(
            [str(jh / "bin" / "jar"), "cf", str(JAR), "-C", tmp, "geobufspark"],
            check=True)
    return JAR


if __name__ == "__main__":
    out = build(force="--force" in sys.argv)
    print(out if out else "no JDK found and no prebuilt jar", file=sys.stderr)
    sys.exit(0 if out else 1)
