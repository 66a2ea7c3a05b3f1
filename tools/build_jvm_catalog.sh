#!/usr/bin/env bash
# Build the JVM TableCatalog plugin (jvm/src) into jvm/lance-jvm-catalog.jar.
# Compiles against the pyspark-bundled Spark jars; requires only javac 17+.
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK_JARS="$(python3 -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
OUT=jvm/classes
rm -rf "$OUT" && mkdir -p "$OUT"

javac -proc:none -encoding UTF-8 --release 17 -classpath "$SPARK_JARS/*" -d "$OUT" \
  jvm/src/io/lancespark/*.java

jar --create --file jvm/lance-jvm-catalog.jar -C "$OUT" .
rm -rf "$OUT"
echo "built jvm/lance-jvm-catalog.jar"
