"""``lc_run``: CLI entry point running the pipeline (reference
lightcurver/scripts/run.py:9-61).

Usage:
    python -m lightcurver_tpu.scripts.run config.yaml [--start X] [--stop Y]
"""

import argparse
import os
from pathlib import Path

import yaml

_DAG_PATH = (Path(__file__).parent.parent / "pipeline"
             / "pipeline_dependency_graph.yaml")


def run():
    with open(_DAG_PATH) as f:
        pipe_config = yaml.safe_load(f)
    task_list = "\n      - ".join(
        task["name"] for task in pipe_config["tasks"])
    docstring = f"""
    Run the lightcurver_tpu pipeline (entirely, or between two steps).
    The pipeline is incremental: re-running it only processes new work.

    Step names for --start / --stop:
      - {task_list}
    """
    parser = argparse.ArgumentParser(
        description=docstring,
        formatter_class=argparse.RawTextHelpFormatter)
    parser.add_argument("config_file", type=str,
                        help="Path to the config.yaml configuration file.")
    parser.add_argument("--start", type=str, default=None,
                        help="Step to start from (default: beginning).")
    parser.add_argument("--stop", type=str, default=None,
                        help="Step to stop at (default: end).")
    args = parser.parse_args()

    os.environ["LIGHTCURVER_CONFIG"] = args.config_file
    from ..pipeline.workflow_manager import WorkflowManager

    WorkflowManager().run(start_step=args.start, stop_step=args.stop)


if __name__ == "__main__":
    run()
