"""Shared bootstrap: running `python examples/<name>.py` puts examples/
(the script dir) on sys.path, not the repo root — importing this module
(which IS on that path) adds the root so `riot_ray` resolves."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
