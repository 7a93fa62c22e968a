# brax-v0 compatibility shim package; see loader.py and brax/__init__.py.
