"""Build the API documentation with pdoc (reference build_doc.py parity).

Requires ``pip install pdoc`` (not bundled); docstrings follow the google
format throughout the package.
"""

import argparse
import shutil
import sys
from subprocess import run

parser = argparse.ArgumentParser()
parser.add_argument("--out", "-o", action="store_true",
                    help="write HTML to tmp/ instead of serving")
args = parser.parse_args()

if shutil.which("pdoc") is None:
    sys.exit("pdoc is not installed — `pip install pdoc` to build the API docs")

cmd = ["pdoc", "--docformat", "google"]
if args.out:
    cmd.extend(["--out", "tmp/"])
cmd.append("torch_em_tpu")

run(cmd)
