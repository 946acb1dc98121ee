#!/usr/bin/env python3
"""Self-evidencing leak scan (ADVICE r6: a zero-hit artifact must carry
run-specific evidence so a genuine re-run is distinguishable from a
hand-edited round bump).

Scans every tracked text file for the same seven categories the round
gate checks and stamps the artifact with the scanned commit SHA, the
file count, and per-category hit lists.

Usage: python3 tools/leakcheck.py [outPath]   (default: stdout)
"""
import json
import re
import subprocess
import sys

PATTERNS = {
    "internal-import": r"import\s+(?:com|net|io)\.(?:anthropic|anthro)\b",
    "internal-url": r"https?://[a-z0-9.-]*\b(?:anthropic|ant-internal)\b",
    "internal-pkg2": r"\banthropic[-_.]internal\b",
    "internal-bucket": r"s3://[a-z0-9.-]*(?:anthropic|internal)[a-z0-9.-]*",
    "slack-link": r"\bslack\.com/archives\b|#claude-code",
    "api-key": r"\b(?:sk|key)-[A-Za-z0-9]{20,}\b",
    "axon-env": r"\bAXON_[A-Z_]+\b",
}


def main(out_path=None):
    sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                         text=True).stdout.strip()
    # NUL-separated so filenames with spaces scan as one path instead
    # of silently splitting into nonexistent ones
    files = [f for f in subprocess.run(["git", "ls-files", "-z"],
                                       capture_output=True,
                                       text=True).stdout.split("\0") if f]
    hits = {k: [] for k in PATTERNS}
    scanned = 0
    for f in files:
        try:
            with open(f, encoding="utf-8", errors="ignore") as fh:
                text = fh.read()
        except (IsADirectoryError, FileNotFoundError):
            continue
        scanned += 1
        for cat, pat in PATTERNS.items():
            for m in re.finditer(pat, text):
                # this file declares the patterns; its own matches are
                # the scanner, not a leak
                if f == "tools/leakcheck.py":
                    continue
                hits[cat].append({"file": f, "match": m.group(0)[:80]})
    out = {
        "commit": sha,
        "files_scanned": scanned,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
        "generated_by": "tools/leakcheck.py",
    }
    text = json.dumps(out, indent=2)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(text)
    else:
        print(text)
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
