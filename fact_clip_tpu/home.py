"""Project base-dir resolution (data/log paths are relative to the repo root).

Mirrors /root/reference/fact_clip/home.py:3-11.
"""

import os


def get_project_base() -> str:
    pkg_dir = os.path.dirname(os.path.realpath(__file__))
    return os.path.dirname(pkg_dir) + "/"


if __name__ == "__main__":
    print(get_project_base())
