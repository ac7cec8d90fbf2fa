"""Sources: synthetic pages generator, dimension tables, catalog shim,
testdata loaders."""
