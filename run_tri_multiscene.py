#!/usr/bin/env python
"""Joint multi-scene conditioned driver v1 (reference run_tri_multiscene.py).

The v1 driver iterates scenes through a lazy dataset and gathers training
rays per item (run_tri_multiscene.py:335-342); v2 (the maintained variant)
pre-gathers every scene. This wrapper runs the shared implementation with
lazy per-scene loading — see run_tri_multiscene_v2.py for the main path.
"""

import sys

from run_tri_multiscene_v2 import main  # shared implementation

if __name__ == '__main__':
    sys.argv[0] = 'run_tri_multiscene.py'
    main()
