"""SLURM submission helper (reference torch_em/util/submit_slurm.py).

Writes a batch-script template for a training script and submits it; TPU-VM
oriented defaults (no gres=gpu; the TPU is attached to the host).
"""

import os
import subprocess
import sys
from datetime import datetime

__all__ = ["write_slurm_template", "submit_slurm", "main"]


def write_slurm_template(script, out_path, env_name, n_threads, mem_limit, time_limit,
                         qos, mail_address=None, exclude_nodes=None):
    """Write the SLURM batch template (reference submit_slurm.py:17)."""
    slurm_template = ("#!/bin/bash\n"
                      "#SBATCH -A kreshuk\n"
                      "#SBATCH -N 1\n"
                      f"#SBATCH -c {n_threads}\n"
                      f"#SBATCH --mem {mem_limit}\n"
                      f"#SBATCH -t {time_limit}\n"
                      f"#SBATCH --qos={qos}\n")
    if mail_address is not None:
        slurm_template += ("#SBATCH --mail-type=FAIL,BEGIN,END\n"
                           f"#SBATCH --mail-user={mail_address}\n")
    if exclude_nodes is not None:
        slurm_template += f"#SBATCH --exclude={','.join(exclude_nodes)}\n"
    slurm_template += ("\n"
                       f"source activate {env_name}\n"
                       "\n"
                       f"python {script} $@ \n")
    with open(out_path, "w") as f:
        f.write(slurm_template)


def submit_slurm(script, input_, n_threads=7, mem_limit="64G", time_limit="2-00:00:00",
                 qos="normal", env_name=None, mail_address=None, exclude_nodes=None):
    """Submit a python script to SLURM (reference submit_slurm.py:48)."""
    tmp_folder = os.path.expanduser("~/.tpu_em/slurm")
    os.makedirs(tmp_folder, exist_ok=True)

    print("Submitting training script %s to cluster" % script)
    print("with arguments %s" % " ".join(input_))

    script_name = os.path.splitext(os.path.split(script)[1])[0]
    dt = datetime.now().strftime("%Y_%m_%d_%H_%M_%S_%f")
    tmp_name = "%s_%s" % (script_name, dt)
    batch_script = os.path.join(tmp_folder, "%s.sh" % tmp_name)
    log = os.path.join(tmp_folder, "%s.log" % tmp_name)
    err = os.path.join(tmp_folder, "%s.err" % tmp_name)

    if env_name is None:
        env_name = os.environ.get("CONDA_DEFAULT_ENV", "base")

    write_slurm_template(script, batch_script, env_name, int(n_threads), mem_limit, time_limit,
                         qos, mail_address, exclude_nodes)

    cmd = ["sbatch", "-o", log, "-e", err, "-J", script_name, batch_script]
    cmd.extend(input_)
    subprocess.run(cmd, check=True)


def scrape_kwargs(input_):
    """@private"""
    params = inspect_signature()
    kwargs = {}
    remaining = []
    i = 0
    while i < len(input_):
        arg = input_[i]
        name = arg.lstrip("-")
        if arg.startswith("-") and name in params:
            kwargs[name] = input_[i + 1]
            i += 2
        else:
            remaining.append(arg)
            i += 1
    return kwargs, remaining


def inspect_signature():
    import inspect

    return list(inspect.signature(submit_slurm).parameters)[2:]


def main():
    script = os.path.realpath(os.path.abspath(sys.argv[1]))
    input_ = sys.argv[2:]
    kwargs, input_ = scrape_kwargs(input_)
    submit_slurm(script, input_, **kwargs)
