#!/usr/bin/env python3
"""Self-evidencing leak scan over the repo's tracked sources.

The per-round LEAKCHECK.json is produced by the harness; its hits were
historically the only payload, so a round where the scan silently didn't
run is indistinguishable from a clean round (ADVICE r11). This in-repo
generator emits the same category structure PLUS provenance fields —
scan UTC timestamp, scanned-file count, and byte total — so the artifact
itself proves a scan happened and over how much input.

Usage: python3 scripts/leakcheck.py [out.json]   (default: stdout)
"""
import datetime
import hashlib
import hmac
import json
import os
import re
import secrets
import subprocess
import sys

# Category -> pattern. Mirrors the harness categories: anything that
# looks like a non-public import, host, bucket, credential, or tracker
# shorthand. Patterns are written against *shape*, not a blocklist of
# actual names, so the scan stays meaningful without embedding the very
# strings it polices.
PATTERNS = {
    "internal-import": r"^\s*import\s+(?:com|net|io|ai|dev|corp)\.(?!sun\.|github\.)[a-z0-9_.]+",
    "internal-url": r"https?://(?!localhost|127\.0\.0\.1|www\.w3\.org|github\.com|spark\.apache\.org|issues\.apache\.org|duckdb\.org|en\.wikipedia\.org|arxiv\.org|docs\.oracle\.com|dl\.acm\.org)[a-z0-9.-]+\.(?:corp|internal|int|dev|prod)[a-z0-9./-]*",
    "internal-bucket": r"(?:s3a?|gs|abfss?)://[a-z0-9._-]+",
    "slack-link": r"(?:slack\.com/archives|#[a-z0-9-]{3,}-(?:eng|infra|oncall|alerts))",
    "api-key": r"(?:AKIA[0-9A-Z]{16}|-----BEGIN (?:RSA |EC )?PRIVATE KEY|xox[baprs]-[0-9A-Za-z-]{10,}|AIza[0-9A-Za-z_-]{35})",
    "env-secret": r"(?:API_KEY|SECRET|TOKEN|PASSWORD)\s*=\s*['\"][^'\"]{8,}",
}

SCAN_SUFFIXES = (".scala", ".py", ".sbt", ".sh", ".md", ".json")

# Categories whose matched text is itself the secret: the report must
# not propagate it (the scan that catches a leak must not re-leak it
# into the committed LEAKCHECK.json — ADVICE r12).
REDACTED_CATEGORIES = {"api-key", "env-secret"}

# Keyed-hash salt for redaction digests (ADVICE r14): a plain truncated
# SHA-256 of the matched credential is offline-brute-forceable for
# low-entropy secrets. The HMAC key lives OUTSIDE the repo (never
# committed), is generated once, and is stable across runs on the same
# machine — so two runs can still tell whether a hit is the same match,
# but the committed digest is useless without the key.
#
# ADVICE r15 hardening: the key lives in a per-user state dir (not
# world-writable /tmp, where another local user could pre-plant a known
# key or a symlink, and where a reboot wipe would churn every committed
# digest), and is created with O_CREAT|O_EXCL|O_NOFOLLOW at 0600 so it
# is never written through a symlink or with a readable window.


def default_salt_path():
    state = os.environ.get("XDG_STATE_HOME") or os.path.join(
        os.path.expanduser("~"), ".local", "state")
    return os.path.join(state, "graft", "leakcheck_salt")


SALT_PATH = os.environ.get("GRAFT_LEAKCHECK_SALT", default_salt_path())


def redaction_key():
    def read_existing():
        try:
            with open(SALT_PATH, "rb") as fh:
                return fh.read()
        except OSError:
            return b""

    key = read_existing()
    if key:
        return key
    parent = os.path.dirname(SALT_PATH)
    if parent:
        os.makedirs(parent, mode=0o700, exist_ok=True)
    flags = os.O_CREAT | os.O_EXCL | os.O_WRONLY
    if hasattr(os, "O_NOFOLLOW"):
        flags |= os.O_NOFOLLOW
    # Write-to-tmp + atomic replace: the salt file is never observable
    # empty or half-written, a crashed earlier run's zero-byte file is
    # simply replaced, and two racing first runs each land a COMPLETE
    # key with the last writer winning — both re-read the final file so
    # later runs correlate against the surviving key (r16 review: the
    # unlink-and-retry variant could orphan a racer's key).
    fresh = secrets.token_bytes(32)
    tmp = f"{SALT_PATH}.{os.getpid()}.tmp"
    # a crashed earlier run under a since-recycled pid may have left this
    # exact tmp name behind; the parent dir is 0700 (ours alone), so
    # removing it is safe and keeps O_EXCL meaningful for the create
    try:
        os.unlink(tmp)
    except FileNotFoundError:
        pass
    try:
        fd = os.open(tmp, flags, 0o600)
        try:
            os.write(fd, fresh)
        finally:
            os.close(fd)
        os.replace(tmp, SALT_PATH)
    except OSError:
        # never leak a half-written tmp: remove it before surfacing the
        # failure (ADVICE r16)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return read_existing() or fresh


def tracked_files():
    out = subprocess.run(["git", "ls-files"], capture_output=True,
                         text=True, check=True).stdout.splitlines()
    return [f for f in out if f.endswith(SCAN_SUFFIXES)]


def main():
    compiled = {k: re.compile(v) for k, v in PATTERNS.items()}
    hits = {k: [] for k in PATTERNS}
    key = redaction_key()
    files = tracked_files()
    total_bytes = 0
    for path in files:
        try:
            with open(path, "rb") as fh:
                raw = fh.read()
        except OSError:
            continue
        total_bytes += len(raw)
        text = raw.decode("utf-8", errors="replace")
        for lineno, line in enumerate(text.splitlines(), 1):
            for cat, rx in compiled.items():
                m = rx.search(line)
                if m:
                    if cat in REDACTED_CATEGORIES:
                        # never copy ANY part of a credential into the
                        # committed artifact — a prefix of the match can
                        # itself be secret material (ADVICE r13), and an
                        # unkeyed digest of a low-entropy secret is
                        # brute-forceable offline (ADVICE r14). Record
                        # only path:line + a truncated KEYED hash so two
                        # runs (same machine, same out-of-repo key) can
                        # tell whether it is the same match.
                        digest = hmac.new(
                            key, m.group(0).encode(),
                            hashlib.sha256).hexdigest()[:12]
                        hits[cat].append(
                            f"{path}:{lineno}: hmac256:{digest}[redacted]")
                    else:
                        hits[cat].append(
                            f"{path}:{lineno}: {line.strip()[:120]}")
    report = {
        "scanned_at_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "n_files_scanned": len(files),
        "n_bytes_scanned": total_bytes,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    out = json.dumps(report, indent=2)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            fh.write(out + "\n")
    else:
        print(out)
    return 1 if report["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
