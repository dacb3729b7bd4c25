"""``python -m troute_tpu -f config.yaml`` — CLI entry point (reference
parity: ``python -m nwm_routing -f -V4 config.yaml``)."""

import logging
import sys

from troute_tpu.cli import main_v04

if __name__ == "__main__":
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    main_v04(sys.argv[1:])
