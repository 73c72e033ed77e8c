#!/usr/bin/env python3
"""Repo leak scan with PROVENANCE (r12 verdict item 3).

The per-round LEAKCHECK.json historically changed only its "round"
field between rounds, so a skipped scan was indistinguishable from a
clean re-run. This generator embeds a UTC scan timestamp, the scanned
file count and byte total, so a round-bump-only diff can no longer
masquerade as a fresh scan.

Usage: python3 tools/leakcheck.py [round_no] [repo_root]
Writes LEAKCHECK.json in the current directory.
"""
import json, os, re, sys, time

CATEGORIES = {
    # Proprietary/internal package or import surfaces: anything not on the
    # public dependency list (Spark, scala, java, scalatest, scalacheck).
    # Only fully-qualified reverse-domain roots can leak a proprietary
    # package; local value imports (`import spark.implicits._`) cannot.
    "internal-import": re.compile(
        r"^\s*import\s+(?:com|net|io|dev|ai|co|org)\.(?!apache\.|scalatest|scalacheck"
        r"|junit|slf4j|fasterxml|scala-lang|sun\.net)[\w.]+",  # com.sun.* ships with the JDK
        re.M),
    # Non-public hostnames / short-links.
    "internal-url": re.compile(
        r"https?://(?!localhost|127\.0\.0\.1|0\.0\.0\.0|\[::1\]"
        r"|[\w.-]*(?:apache\.org|github\.com|amazonaws\.com|amazon\.com"
        r"|opensearch\.org|duckdb\.org|scala-lang\.org|scala-sbt\.org"
        r"|example\.com|wikipedia\.org|arxiv\.org|acm\.org|mvnrepository\.com"
        r"|maven\.org))[\w-]+(?:\.[\w-]+)+"),  # dotless hosts = test fixtures
    "internal-pkg2": re.compile(r"\b(?:com|net|io)\.(?:anthropic|internal)\.[\w.]+"),
    "internal-bucket": re.compile(r"s3://(?!examplebucket|my-bucket|bucket-name)[\w.-]+/?"),
    "slack-link": re.compile(r"(?:slack\.com/archives|app\.slack\.com|#[a-z0-9-]*claude[a-z0-9-]*)"),
    "api-key": re.compile(r"(?:sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{20,}|xox[bap]-[A-Za-z0-9-]{10,})"),
    "axon-env": re.compile(r"\b[A-Z][A-Z0-9_]*(?:ANTHROPIC|CLAUDE|AXON)[A-Z0-9_]*\b"),
}

SCAN_EXT = {".scala", ".sbt", ".py", ".md", ".json", ".sql", ".conf", ".properties", ".txt"}
SKIP_DIRS = {"target", ".git", ".idea", ".bsp", "spark-warehouse", "project"}
# Artifact/docs files that legitimately QUOTE pattern names (this scanner,
# prior LEAKCHECK artifacts) are still scanned; hits report file:line so a
# self-match is auditable rather than hidden.

def main():
    # r17 ADVICE: the round number is REQUIRED — a default of 0 let a
    # committed artifact claim "round": 0 while the docs said round 17.
    if len(sys.argv) < 2:
        sys.exit("usage: leakcheck.py <round_no> [repo_root] "
                 "(round number is required; no default)")
    round_no = int(sys.argv[1])
    root = sys.argv[2] if len(sys.argv) > 2 else "."
    hits = {k: [] for k in CATEGORIES}
    n_files = 0
    n_bytes = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
        for fn in sorted(filenames):
            if os.path.splitext(fn)[1] not in SCAN_EXT:
                continue
            path = os.path.join(dirpath, fn)
            if os.path.abspath(path) == os.path.abspath(__file__):
                continue  # the pattern table itself
            try:
                text = open(path, encoding="utf-8", errors="replace").read()
            except OSError:
                continue
            n_files += 1
            n_bytes += os.path.getsize(path)  # file bytes, not decoded chars
            rel = os.path.relpath(path, root)
            for cat, rx in CATEGORIES.items():
                for m in rx.finditer(text):
                    line = text.count("\n", 0, m.start()) + 1
                    hits[cat].append(f"{rel}:{line}:{m.group(0)[:80]}")
    out = {
        "round": round_no,
        "generated_by": "tools/leakcheck.py",
        "scan_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "scanned_files": n_files,
        "scanned_bytes": n_bytes,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    json.dump(out, open(os.path.join(root, "LEAKCHECK.json"), "w"), indent=2)
    print(f"scanned {n_files} files ({n_bytes} bytes): "
          f"{out['n_hits']} hits -> LEAKCHECK.json")

if __name__ == "__main__":
    main()
