#!/usr/bin/env python3
"""Back-compat wrapper: the generator is scripts/make_sf.py (r9).

Usage: python3 scripts/make_sf1.py [copies=10] [outdir=/tmp/sf1]
"""
import runpy
runpy.run_path(__file__.replace("make_sf1.py", "make_sf.py"),
               run_name="__main__")
