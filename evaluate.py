#!/usr/bin/env python
"""Reference CLI surface shim -> `loans_tpu.cli.evaluate`."""

from loans_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
