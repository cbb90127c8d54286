"""Sources: the synthetic Common-Crawl-style pages table, byte-stable text
extraction, and loaders for the driver testdata."""
