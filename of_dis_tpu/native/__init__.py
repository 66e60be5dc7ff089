"""Native (C++) runtime: fast IO + threaded image decoding.

Build with `python setup.py build_ext --inplace`. All consumers treat this
package as optional and fall back to pure-Python paths when the extension is
not built.
"""
