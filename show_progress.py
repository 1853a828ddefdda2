#!/usr/bin/env python
"""Reference CLI surface shim -> `loans_tpu.cli.show_progress`."""

from loans_tpu.cli.show_progress import main

if __name__ == "__main__":
    main()
