"""Regenerate the frozen DEFAULT_MERGES artifact in yomitoku_ray/functions/bpe.py.

Usage: python tools/train_bpe.py [sf_dir] [n_merges]
Trains on the deterministic synthetic corpus (default sf0.001) and rewrites
the DEFAULT_MERGES assignment in place, like any pretrained-tokenizer
release step.
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    from yomitoku_ray.functions.bpe import bpe_train

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    table = bpe_train(sf_dir, n_merges=n_merges)
    pairs = list(zip(table["left"], table["right"]))

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "yomitoku_ray",
        "functions",
        "bpe.py",
    )
    src = open(path).read()
    lines = ",\n".join(f"    ({a!r}, {b!r})" for a, b in pairs)
    replacement = (
        "DEFAULT_MERGES: list[tuple[str, str]] = [\n" + lines + ",\n]"
    )
    new, n = re.subn(
        r"DEFAULT_MERGES: list\[tuple\[str, str\]\] = \[[^\]]*\]",
        replacement.replace("\\", "\\\\"),
        src,
        count=1,
        flags=re.S,
    )
    assert n == 1
    open(path, "w").write(new)
    print(f"wrote {len(pairs)} merges to {path}")
    ray.shutdown()


if __name__ == "__main__":
    main()
