"""Sources: synthetic Common-Crawl-style corpus generator and readers
for the crawl substrate tables (pages, seeds, url_index)."""
