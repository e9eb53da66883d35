"""Pipeline exceptions (reference lightcurver/structure/exceptions.py:1-12)."""


class NoConfigFilePathInEnvironment(Exception):
    """Raised when LIGHTCURVER_CONFIG is not set in the environment."""

    def __init__(self):
        super().__init__(
            "Please define the environment variable LIGHTCURVER_CONFIG: "
            "a path to your config.yaml file.")


class TaskWasNotSuccessful(Exception):
    """Raised by post-task health checks (pipeline/state_checkers.py)."""
