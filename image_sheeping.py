#!/usr/bin/env python
"""Reference CLI surface shim -> `loans_tpu.cli.image_inference`."""

from loans_tpu.cli.image_inference import main

if __name__ == "__main__":
    main()
