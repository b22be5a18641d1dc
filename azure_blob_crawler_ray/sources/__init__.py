"""Sources: frontier seeding and the (synthetic) fetch stage."""
