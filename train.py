"""Repo-checkout shim for the train CLI (reference train.py equivalent).

The implementation lives in sota_imagenet_tpu/cli.py so the installed package
exposes it as the `sota-train` console script (pyproject.toml); this file
keeps `python train.py -c ...` working from a checkout, matching the
reference's invocation (reference train.py:22-185).
"""

from sota_imagenet_tpu.cli import find_auto_resume, main  # noqa: F401

if __name__ == "__main__":
    main()
