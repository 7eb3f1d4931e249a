"""``python -m toyslam_tpu`` entry point."""

import sys

from toyslam_tpu.app import main

sys.exit(main())
