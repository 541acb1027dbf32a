"""Sources: synthetic Common-Crawl-style web-page table + readers."""
