// Oracle driver: print every record of a .two file in the reference's
// PrintLDJson format (reference: lib/core.cpp:528-532). The reference
// CLI never exposes this printer — its `view -J` flag is commented out
// (reference: lib/view.h:37 and :98) — so golden validation of OUR
// JSON view output links the reference objects directly instead.
//
// Built by build_reference.sh into build/two_json (gitignored); links
// the same reference objects as the oracle binary, minus main.o.
#include <iostream>

#include "two_reader.h"

// globals the reference defines in its own main.cpp (excluded here)
std::string tomahawk::LITERAL_COMMAND_LINE;
std::string tomahawk::INTERPRETED_COMMAND;

int main(int argc, char** argv) {
    if (argc < 2) {
        std::cerr << "usage: two_json <file.two>" << std::endl;
        return 1;
    }
    tomahawk::two_reader rdr;
    if (!rdr.Open(argv[1])) {
        std::cerr << "could not open " << argv[1] << std::endl;
        return 2;
    }
    while (rdr.NextRecord()) rdr.it.rcd->PrintLDJson(std::cout);
    return 0;
}
