"""Benchmark runner (SURVEY §2.10 X1-X4): execute commands over the
Cartesian product of config-declared variables, landing each run's
stdout as `<outprefix>.out` with a YAML `.meta` sidecar — exactly the
tree the recipe scanner consumes (sources.scan_csv / S7 sidecar join).

This is the data-PRODUCER half of the reference (bearysta/run.py); it is
deliberately driver-side plain Python — no Spark. Differences from the
reference: commands run in the current environment (the conda
environment management half, conda_env.py/conda_run.py X5, is out of
scope — at 100 TB the runner's role is landing files on object storage
where the engine scans them).

Config surface (run.py:36-138 semantics):
    variables: {name: value-or-list}        # constants become singletons
    commands:  {name: "cmd $var" | {command: ..., variables: {...}}}
    meta-suffix: '.out'                     # sidecar name = outprefix + suffix + '.meta'
Overrides overlay variables/commands; a command value of 'drop' deletes
it. `$(shell)` variable values are precomputed via the shell; `$var`
tokens with empty values are removed from the command line.
"""

from __future__ import annotations

import itertools
import os
import platform
import shlex
import subprocess
import time

import yaml


def load_run_config(path_or_dict) -> dict:
    if isinstance(path_or_dict, dict):
        cfg = dict(path_or_dict)
    else:
        with open(path_or_dict) as f:
            cfg = yaml.safe_load(f)
    cfg.setdefault("variables", {})
    cfg["commands"] = {
        k: (v if isinstance(v, dict) else {"command": v})
        for k, v in cfg.get("commands", {}).items()
    }
    return cfg


def apply_overrides(cfg: dict, overrides: list[dict]) -> dict:
    """X4: overlay variables/commands; 'drop' deletes a command."""
    for override in overrides:
        cfg["variables"].update(override.get("variables", {}))
        for cmd, cmdc in override.get("commands", {}).items():
            if isinstance(cmdc, str):
                if cmdc.strip() == "drop":
                    cfg["commands"].pop(cmd, None)
                    continue
                cmdc = {"command": cmdc}
            if cmd in cfg["commands"]:
                existing = cfg["commands"][cmd]
                if "variables" in existing:
                    existing["variables"].update(cmdc.pop("variables", {}))
                existing.update(cmdc)
            else:
                cfg["commands"][cmd] = cmdc
    return cfg


def expand_matrix(variables: dict) -> list[dict]:
    """X1: Cartesian product; constants normalize to singleton lists and
    every value stringifies (run.py:82-85,98)."""
    norm = {
        k: [str(x) for x in (v if isinstance(v, list) else [v])]
        for k, v in variables.items()
    }
    keys = list(norm)
    return [dict(zip(keys, combo)) for combo in itertools.product(*norm.values())]


def _precompute_shell_vars(assignment: dict, extra_env: dict) -> dict:
    """X2: `$(cmd)` values execute in the shell; stdout replaces them."""
    out = dict(assignment)
    for k, v in assignment.items():
        if v.startswith("$(") and v.endswith(")"):
            env = os.environ.copy()
            env.update(extra_env)
            env.update(out)
            p = subprocess.run(
                v[2:-1], shell=True, capture_output=True, env=env, text=True
            )
            if p.returncode:
                raise RuntimeError(
                    f"shell-precomputed variable {k}={v!r} failed: {p.stderr}"
                )
            out[k] = p.stdout.strip()
    return out


def run_benchmark(
    config,
    run_path: str = "runs",
    run_id: str | None = None,
    suite: str = "benchmark",
    env_name: str = "current",
    commands: list[str] | None = None,
    overrides: list[dict] | None = None,
    dry_run: bool = False,
) -> list[str]:
    """X3: execute every (command × variable-combination), tee stdout to
    `<ts>_<command>.out`, dump the full assignment (plus env_name,
    hostname, outprefix) to the `.meta` sidecar. Returns written .out
    paths."""
    cfg = apply_overrides(load_run_config(config), overrides or [])
    run_id = run_id or str(time.time())
    prefix_dir = os.path.join(run_path, run_id, suite, env_name)
    os.makedirs(prefix_dir, exist_ok=True)
    meta_suffix = cfg.get("meta-suffix", ".out")

    written: list[str] = []
    for endpoint, cmdc in cfg["commands"].items():
        if commands is not None and endpoint not in commands:
            continue
        var_matrix = dict(cfg["variables"])
        var_matrix.update(cmdc.get("variables", {}))
        cmd_template = cmdc["command"]
        argv_template = (
            shlex.split(cmd_template) if isinstance(cmd_template, str) else list(cmd_template)
        )

        for assignment in expand_matrix(var_matrix):
            outprefix = os.path.join(prefix_dir, f"{time.time()}_{endpoint}")
            full = dict(assignment)
            full["env_name"] = env_name
            full["hostname"] = platform.node()
            full["outprefix"] = outprefix
            full = _precompute_shell_vars(full, {})

            argv = []
            for tok in argv_template:
                if tok.startswith("$") and tok[1:] in full:
                    v = full[tok[1:]]
                    if v == "":
                        continue  # empty value removes the arg (run.py:122)
                    argv.append(v)
                else:
                    argv.append(tok)
            if dry_run:
                data = "# skipped: " + " ".join(argv) + "\n"
            else:
                env = os.environ.copy()
                env.update(full)
                p = subprocess.run(argv, capture_output=True, env=env, text=True)
                data = p.stdout

            out_path = outprefix + ".out"
            with open(out_path, "w") as fd:
                fd.write(data)
            with open(outprefix + meta_suffix + ".meta", "w") as fd:
                yaml.safe_dump(full, fd)
            written.append(out_path)
    return written
