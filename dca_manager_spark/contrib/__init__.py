"""Contrib: implemented-but-unverifiable-here surfaces.

Modules in this package are API-complete but CANNOT be executed
end-to-end in this sandbox (missing runtime dependency that cannot be
installed offline). They are deliberately OUTSIDE the supported engine
surface: nothing in dca_manager_spark imports them, COVERAGE.md does
not count them, and the supported twin is always named in the module
doc. Promote a module out of contrib only once its engine test has
actually run."""
