"""Sources & sinks: synthetic corpus generator, testdata loaders, catalog shim."""
