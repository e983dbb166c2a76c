"""Sweep a jax persistent compile cache for corrupt entries and delete them.

A pre-r5 kill mid-write (the r4 bench driver's timeout) could leave a
truncated entry — jax's LRUCache.put was a bare write_bytes until
utils/jaxcache.py made it atomic — and a truncated entry SIGSEGVs
deserialize_executable on the next run that hits it (observed r5).
This validates every entry the cheap way: jax cache entries are
zstd-compressed (zstandard in-image) — a truncated file fails to
decompress cleanly.

Usage: python tools/validate_cache.py <cache_dir> [--delete]
"""
import argparse
import os
import sys


def validate(path: str) -> bool:
    data = open(path, "rb").read()
    if not data:
        return False
    try:
        import zstandard
        zstandard.ZstdDecompressor().decompress(
            data, max_output_size=1 << 31)
        return True
    except ImportError:
        import zlib
        try:
            zlib.decompress(data)
            return True
        except zlib.error:
            return False
    except zstandard.ZstdError:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cache_dir")
    ap.add_argument("--delete", action="store_true",
                    help="remove corrupt entries (default: report only)")
    args = ap.parse_args()
    bad = []
    n = 0
    for root, _dirs, files in os.walk(args.cache_dir):
        for f in files:
            if not f.endswith("-cache"):
                continue
            n += 1
            p = os.path.join(root, f)
            if not validate(p):
                bad.append(p)
                print(f"CORRUPT: {p}", file=sys.stderr)
                if args.delete:
                    os.unlink(p)
    print(f"{n} entries, {len(bad)} corrupt"
          f"{' (deleted)' if args.delete and bad else ''}")
    return 1 if bad and not args.delete else 0


if __name__ == "__main__":
    sys.exit(main())
