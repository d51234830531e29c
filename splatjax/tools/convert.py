"""Asset converter CLI: .ply <-> .splat (the README's documented workflow).

The reference converts .ply to .splat in-browser at load (processPlyBuffer,
index.js:600-745) and its README points users at conversion pages
(README.md:28-66). This CLI performs the same conversion offline with the
identical activation/quantization semantics:

    python -m splatjax.tools.convert scene.ply scene.splat
    python -m splatjax.tools.convert scene.splat scene.ply
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help=".ply or .splat input")
    ap.add_argument("output", help=".splat or .ply output")
    ap.add_argument(
        "--no-importance-sort",
        action="store_true",
        help="skip the descending exp(scale)*sigmoid(opacity) sort "
        "(index.js:653-669)",
    )
    ap.add_argument(
        "--max-sh-degree", type=int, default=3,
        help="SH bands to keep when reading .ply (only .ply output "
        "preserves them; .splat stores DC color only)",
    )
    args = ap.parse_args(argv)

    from splatjax.io import load_ply, load_splat, save_ply, save_splat

    if args.input.endswith(".ply"):
        scene = load_ply(
            args.input,
            importance_sort=not args.no_importance_sort,
            max_sh_degree=args.max_sh_degree,
        )
    elif args.input.endswith(".splat"):
        scene = load_splat(args.input)
    else:
        print(f"unsupported input format: {args.input}", file=sys.stderr)
        return 2

    if args.output.endswith(".splat"):
        save_splat(args.output, scene)
    elif args.output.endswith(".ply"):
        save_ply(args.output, scene)
    else:
        print(f"unsupported output format: {args.output}", file=sys.stderr)
        return 2
    print(f"{args.input} -> {args.output}: {scene.num_gaussians} gaussians")
    return 0


if __name__ == "__main__":
    sys.exit(main())
