class SPARQLWrapperException(Exception):
    pass


class EndPointNotFound(SPARQLWrapperException):
    pass


class QueryBadFormed(SPARQLWrapperException):
    pass


class Unauthorized(SPARQLWrapperException):
    pass


class EndPointInternalError(SPARQLWrapperException):
    pass
