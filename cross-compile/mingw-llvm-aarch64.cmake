# Cross-compile the C runtime for Windows-on-ARM with llvm-mingw
# (reference parity: cross-compile/mingw-llvm-aarch64.cmake).
set(CMAKE_SYSTEM_NAME Windows)
set(CMAKE_SYSTEM_PROCESSOR aarch64)

set(RADE_TRIPLE ${CMAKE_SYSTEM_PROCESSOR}-w64-mingw32)
set(CMAKE_C_COMPILER ${RADE_TRIPLE}-clang)
set(CMAKE_C_COMPILER_TARGET ${RADE_TRIPLE})
set(CMAKE_AR ${RADE_TRIPLE}-ar)
set(CMAKE_RANLIB ${RADE_TRIPLE}-ranlib)
set(CMAKE_RC_COMPILER ${RADE_TRIPLE}-windres)

set(CMAKE_FIND_ROOT_PATH_MODE_PROGRAM NEVER)
set(CMAKE_FIND_ROOT_PATH_MODE_LIBRARY ONLY)
set(CMAKE_FIND_ROOT_PATH_MODE_INCLUDE ONLY)
