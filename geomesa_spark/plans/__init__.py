"""Driver-side planning: geometry→cell covers, filter→scan plans."""
