"""(registrations added in a later milestone)"""
