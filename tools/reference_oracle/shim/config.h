#ifndef SHIM_CONFIG_H
#define SHIM_CONFIG_H
#define VERSION "3.3.0"
#endif
